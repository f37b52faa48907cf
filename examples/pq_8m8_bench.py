"""8.8M-scale PQ + truncated-PCA-refine benchmark (BASELINE config #4 at
faiss-PQ-comparable bytes/vector).

The corpus never exists in f32 anywhere: slabs are generated on device from
PRNG keys with a REALISTIC decaying spectrum (matched to the measured
real-embedding spectrum of `real_embedding_eval.py` — top64 ~96% variance;
i.i.d. isotropic gaussians are PQ's provable worst case and would understate
every compressor identically), encoded to PQ codes + truncated-PCA int8
refine rows, and assembled with buffer donation. Exact f32 ground truth is a
running top-k over regenerated slabs.

Memory story at 8.8M x 768:
  flat bf16   13.5 GB (near the 16 GB v5e ceiling)
  int8         6.8 GB
  pq64+ref128  1.7 GB  <- this config (192 B/vec)
  pq64 only    0.57 GB

Run: python examples/pq_8m8_bench.py [--n 8841823] [--k_factor 16]
"""

from __future__ import annotations

import argparse
import functools
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8_841_823)
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--m", type=int, default=64, help="PQ subquantizers")
    ap.add_argument("--code_bits", type=int, default=8, choices=(8, 4),
                    help="4 = fast-scan PQ{M}x4 (nibble-packed codes, 16-entry codebooks)")
    ap.add_argument("--refine_dim", type=int, default=128)
    ap.add_argument("--k_factor", type=int, default=16)
    ap.add_argument("--train", type=int, default=262_144)
    ap.add_argument("--kmeans_iters", type=int, default=6)
    ap.add_argument("--n_eval", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vod_tpu.ops import pq as pq_ops
    from vod_tpu.search import SearchQueries
    from vod_tpu.search.dense import PQIndex, pq_search

    n, d, m, rdim, k = args.n, args.d, args.m, args.refine_dim, 10
    cb_bytes = m // 2 if args.code_bits == 4 else m  # code bytes/vector
    n_slabs = 8
    slab = -(-(-(-n // n_slabs)) // 8192) * 8192
    n_pad = slab * n_slabs

    # decaying spectrum matched to the measured real-embedding profile, mixed
    # by a fixed random rotation: a PERFECTLY axis-aligned spectrum is PQ's
    # adversarial case (the first subspace would carry nearly all the energy;
    # real embeddings spread PCA directions across raw dims). Measured here:
    # axis-aligned pq64+ref128 recall@10 0.20 vs rotated ~0.9 at 8.8M.
    spec = jnp.exp(-jnp.arange(d) / 35.0).astype(jnp.float32)
    basis, _ = jnp.linalg.qr(jax.random.normal(jax.random.PRNGKey(99), (d, d)))
    basis = basis.astype(jnp.float32)

    # NOTE (remote-relay): basis and trained params ride as jit ARGUMENTS —
    # closed-over device arrays embed as program literals, shipped by the
    # remote-compile relay at ~100 s/MB per compile (see bench.py NOTE).
    @jax.jit
    def gen_slab(key, basis):
        z = jax.random.normal(key, (slab, d), dtype=jnp.float32) * spec
        x = z @ basis
        return x / jnp.linalg.norm(x, axis=-1, keepdims=True)

    keys = [jax.random.PRNGKey(2000 + i) for i in range(n_slabs)]

    # --- train on a device-generated sample ---------------------------------
    t0 = time.time()
    train = gen_slab(keys[0], basis)[: args.train]
    codebooks = pq_ops.train_pq(
        jax.random.PRNGKey(0), train, m, n_codes=1 << args.code_bits,
        n_iters=args.kmeans_iters,
    )
    refine_proj, _mean = pq_ops.train_projection(train, rdim)
    ref_sample = train @ refine_proj
    refine_scale = jnp.maximum(jnp.max(jnp.abs(ref_sample), axis=0, keepdims=True), 1e-8) / 127.0
    del train, ref_sample
    print(f"# trained PQ{m} + PCA-{rdim} refine on {args.train} rows in {time.time()-t0:.0f}s",
          flush=True)

    # --- encode slabs on device, assemble with donation ---------------------
    from vod_tpu.search.dense import _pack_codes4

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def fill(codes, refine, key, row0, basis, codebooks, refine_proj, refine_scale):
        x = gen_slab(key, basis)
        c = pq_ops.encode_pq(codebooks, x)
        if args.code_bits == 4:
            c = _pack_codes4(c)
        r = jnp.clip(jnp.round((x @ refine_proj) / refine_scale), -127, 127).astype(jnp.int8)
        return (
            jax.lax.dynamic_update_slice(codes, c, (row0, 0)),
            jax.lax.dynamic_update_slice(refine, r, (row0, 0)),
        )

    t0 = time.time()
    codes = jnp.zeros((n_pad, cb_bytes), jnp.uint8)
    refine = jnp.zeros((n_pad, rdim), jnp.int8)
    for i, kk in enumerate(keys):
        codes, refine = fill(codes, refine, kk, jnp.int32(i * slab),
                             basis, codebooks, refine_proj, refine_scale)
    codes.block_until_ready()
    build_s = time.time() - t0
    print(f"# encoded {n_pad} rows in {build_s:.0f}s "
          f"({(n_pad * (cb_bytes + rdim)) / 2**30:.2f} GB on device)", flush=True)

    # three pipelines over the SAME arrays (all 192 B/vec on device):
    #   exh+ref  — exhaustive decode+matmul ADC pool -> exact PCA-int8 re-rank
    #   coarse   — int8 MXU scan of the PCA-128 rows (6x cheaper than decoding
    #              768-dim bf16) -> ADC rescore of n_candidates
    #   coarse+ref — coarse scan -> ADC -> exact re-rank, sharing the PCA rows
    #              as BOTH the coarse scanner and the refine store
    variants = {
        "exh": PQIndex(  # pure streaming ADC, zero gathers (code bytes only)
            codebooks=codebooks, codes=codes, n_real=n, approx_recall=0.95,
            code_bits=args.code_bits,
        ),
        "exh+ref8": PQIndex(
            codebooks=codebooks, codes=codes,
            refine_codes=refine, refine_scale=refine_scale, refine_proj=refine_proj,
            n_real=n, k_factor=8, approx_recall=0.95, code_bits=args.code_bits,
        ),
        "exh+ref": PQIndex(
            codebooks=codebooks, codes=codes,
            refine_codes=refine, refine_scale=refine_scale, refine_proj=refine_proj,
            n_real=n, k_factor=args.k_factor, approx_recall=0.95,
            code_bits=args.code_bits,
        ),
    }
    index = variants["exh+ref"]

    # --- queries + exact f32 ground truth -----------------------------------
    rng = np.random.default_rng(0)
    s0 = np.asarray(gen_slab(keys[0], basis)[: args.n_eval])
    # noise is spectrum-shaped AND rotated through `basis` like the corpus:
    # real queries are encoder outputs on the same manifold (unrotated noise
    # puts energy off-manifold and pessimizes subspace codecs)
    noise = (rng.standard_normal((args.n_eval, d)).astype(np.float32)
             * np.asarray(spec)) @ np.asarray(basis)
    q = s0 + 0.1 * noise
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    jq = jnp.asarray(q)

    @jax.jit
    def gt_slab(key, top_s, top_i, offset, jq, basis):
        x = gen_slab(key, basis)
        s = jnp.dot(jq, x.T, preferred_element_type=jnp.float32)
        row = offset + jax.lax.broadcasted_iota(jnp.int32, (1, slab), 1)
        s = jnp.where(row < n, s, -jnp.inf)
        c_s, c_pos = jax.lax.top_k(s, k)
        all_s = jnp.concatenate([top_s, c_s], axis=-1)
        all_i = jnp.concatenate([top_i, offset + c_pos], axis=-1)
        new_s, pos = jax.lax.top_k(all_s, k)
        return new_s, jnp.take_along_axis(all_i, pos, axis=-1)

    top_s = jnp.full((args.n_eval, k), -jnp.inf)
    top_i = jnp.full((args.n_eval, k), -1, jnp.int32)
    for i, kk in enumerate(keys):
        top_s, top_i = gt_slab(kk, top_s, top_i, jnp.int32(i * slab), jq, basis)
    gt_i = np.asarray(top_i)
    print("# ground truth done", flush=True)

    # --- QPS (shape-warmed, differenced; index passed as jit argument) ------
    def make_queries(nq, seed=0):
        r = np.random.default_rng(seed)
        base = np.tile(q, (-(-nq // args.n_eval), 1))[:nq]
        out_q = base + 1e-3 * r.standard_normal((nq, d)).astype(np.float32)
        return out_q / np.linalg.norm(out_q, axis=1, keepdims=True)

    small, block, blocks = 256, 2048, 4
    p1 = [jnp.asarray(make_queries(small, seed=i)) for i in range(3)]
    p2 = [jnp.asarray(np.stack([make_queries(block, seed=50 + 7 * i + j) for j in range(blocks)]))
          for i in range(3)]

    # --- prototype: fused dual-estimator scan --------------------------------
    # one chunk loop streams BOTH the PQ codes (decode+matmul ADC) and the
    # PCA-int8 rows (int8 MXU matmul); final score = mean of the two
    # estimates. The two error sources are independent (PQ quantization vs
    # PCA truncation), so the combination beats either alone — with ZERO
    # candidate gathers (the latency-bound step of refine pipelines).
    from vod_tpu.search.dense import _scan_topk, decode_rows

    def dual_search_indices(arrs, qv, chunk=65536, w_adc=0.5):
        codes_, refine_ = arrs
        b = qv.shape[0]
        q_eff = qv.astype(jnp.float32)
        q_mm = q_eff.astype(jnp.bfloat16)
        q_pca = (q_eff @ refine_proj) * refine_scale  # [B, rdim] f32

        def score_chunk(start):
            c = jax.lax.dynamic_slice_in_dim(codes_, start, chunk, axis=0)
            dec = decode_rows(codebooks, c, dtype=jnp.bfloat16)
            s_adc = jnp.dot(q_mm, dec.T, preferred_element_type=jnp.float32)
            r = jax.lax.dynamic_slice_in_dim(refine_, start, chunk, axis=0)
            s_pca = jnp.dot(q_pca, r.T.astype(jnp.float32), preferred_element_type=jnp.float32)
            return w_adc * s_adc + (1.0 - w_adc) * s_pca

        return _scan_topk(score_chunk, n_pad, n, b, k, chunk, approx_recall=0.95)[1]

    # --- prototype: one-hot-matmul decode (gather-free ADC) ------------------
    # decode gather (N x M codebook lookups) is the measured exhaustive-ADC
    # bottleneck (m=64 -> ~1.6k QPS, m=128 -> ~0.9k: scales with lookups, not
    # FLOPs). One-hot decode runs on the MXU: onehot(codes) [c, M, 256] bf16
    # einsum'd with the codebooks — ~12% extra FLOPs, zero gathers.
    def exh_onehot_indices(arrs, qv, chunk=8192):
        codes_, _ = arrs
        b = qv.shape[0]
        q_mm = qv.astype(jnp.bfloat16)
        cb = codebooks.astype(jnp.bfloat16)
        iota = jnp.arange(256, dtype=jnp.int32)

        def score_chunk(start):
            c = jax.lax.dynamic_slice_in_dim(codes_, start, chunk, axis=0)
            oh = (c.astype(jnp.int32)[:, :, None] == iota[None, None, :]).astype(jnp.bfloat16)
            dec = jnp.einsum("cmk,mkd->cmd", oh, cb, preferred_element_type=jnp.bfloat16)
            dec = dec.reshape(chunk, -1)
            return jnp.dot(q_mm, dec.T, preferred_element_type=jnp.float32)

        return _scan_topk(score_chunk, n_pad, n, b, k, chunk, approx_recall=0.95)[1]

    # the prototype scans above assume 8-bit (256-entry) codebooks and
    # unpacked codes; the production `pq_search` path below handles both widths
    prototype_wadcs = (0.3, 0.5) if args.code_bits == 8 else ()
    if args.code_bits == 8:
        f = jax.jit(exh_onehot_indices)
        got = np.asarray(f((codes, refine), jq))
        recall = float(np.mean(
            [len(set(got[i].tolist()) & set(gt_i[i].tolist())) / k for i in range(args.n_eval)]
        ))
        fb = jax.jit(lambda arrs, qb: jax.lax.map(lambda v: exh_onehot_indices(arrs, v), qb))
        np.asarray(f((codes, refine), p1[0])[0, 0])
        np.asarray(fb((codes, refine), p2[0])[0, 0, 0])
        w1 = w2 = float("inf")
        for i in range(3):
            t = time.time(); np.asarray(f((codes, refine), p1[i])[-1]); w1 = min(w1, time.time() - t)
            t = time.time(); np.asarray(fb((codes, refine), p2[i])[-1, -1]); w2 = min(w2, time.time() - t)
        qps = (blocks * block - small) / max(w2 - w1, 1e-9)
        print(json.dumps({
            "codec": f"pq{m}:exh-onehot", "n": n, "bytes_per_vec": m,
            "recall10": round(recall, 4), "qps": round(qps),
        }), flush=True)

    for w_adc in prototype_wadcs:
        f = jax.jit(functools.partial(dual_search_indices, w_adc=w_adc))
        got = np.asarray(f((codes, refine), jq))
        recall = float(np.mean(
            [len(set(got[i].tolist()) & set(gt_i[i].tolist())) / k for i in range(args.n_eval)]
        ))
        fb = jax.jit(lambda arrs, qb, w=w_adc: jax.lax.map(
            lambda v: dual_search_indices(arrs, v, w_adc=w), qb
        ))
        np.asarray(f((codes, refine), p1[0])[0, 0])
        np.asarray(fb((codes, refine), p2[0])[0, 0, 0])
        w1 = w2 = float("inf")
        for i in range(3):
            t = time.time(); np.asarray(f((codes, refine), p1[i])[-1]); w1 = min(w1, time.time() - t)
            t = time.time(); np.asarray(fb((codes, refine), p2[i])[-1, -1]); w2 = min(w2, time.time() - t)
        qps = (blocks * block - small) / max(w2 - w1, 1e-9)
        print(json.dumps({
            "codec": f"pq{m}+pca{rdim}:dual{w_adc}", "n": n, "bytes_per_vec": m + rdim,
            "recall10": round(recall, 4), "qps": round(qps),
        }), flush=True)

    for vname, index in variants.items():
        out = pq_search(index, SearchQueries(vector=jq), top_k=k)
        got = np.asarray(out.indices)
        recall = float(np.mean(
            [len(set(got[i].tolist()) & set(gt_i[i].tolist())) / k for i in range(args.n_eval)]
        ))
        sfn = jax.jit(lambda ix, v: pq_search(ix, SearchQueries(vector=v), top_k=k).indices)
        sfn_blocks = jax.jit(
            lambda ix, qb: jax.lax.map(
                lambda v: pq_search(ix, SearchQueries(vector=v), top_k=k).indices, qb
            )
        )
        np.asarray(sfn(index, p1[0])[0, 0])
        np.asarray(sfn_blocks(index, p2[0])[0, 0, 0])
        w1 = w2 = float("inf")
        for i in range(3):
            t = time.time(); np.asarray(sfn(index, p1[i])[-1]); w1 = min(w1, time.time() - t)
            t = time.time(); np.asarray(sfn_blocks(index, p2[i])[-1, -1]); w2 = min(w2, time.time() - t)
        qps = (blocks * block - small) / max(w2 - w1, 1e-9)
        bits_tag = "x4" if args.code_bits == 4 else ""
        print(json.dumps({
            "codec": f"pq{m}{bits_tag}+pca{rdim}:{vname}",
            "n": n, "bytes_per_vec": cb_bytes + rdim,
            "hbm_gb": round((n_pad * (cb_bytes + rdim)) / 2**30, 2),
            "recall10": round(recall, 4), "qps": round(qps), "build_s": round(build_s, 1),
            "k_factor": args.k_factor,
        }), flush=True)

    # --- int8 full-D comparator on the SAME corpus + GT ----------------------
    # interprets the PQ number: on a spectrum-packed synthetic every codec
    # fights near-tied scores, so the honest read is relative-to-int8
    del variants, index, codes, refine
    from vod_tpu.search.dense import DenseIndex, dense_search

    # per-dim scale: after the random rotation every raw dim has std
    # ~ sqrt(mean(spec^2))/||x|| = 1/sqrt(d); saturate int8 at ~5 sigma
    i8_scale = jnp.full((1, d), 5.0 / np.sqrt(d) / 127.0, jnp.float32)

    @functools.partial(jax.jit, donate_argnums=0)
    def fill8(buf, key, row0, basis):
        x = gen_slab(key, basis)
        c = jnp.clip(jnp.round(x / i8_scale), -127, 127).astype(jnp.int8)
        return jax.lax.dynamic_update_slice(buf, c, (row0, 0))

    t0 = time.time()
    buf = jnp.zeros((n_pad, d), jnp.int8)
    for i, kk in enumerate(keys):
        buf = fill8(buf, kk, jnp.int32(i * slab), basis)
    buf.block_until_ready()
    idx8 = DenseIndex(vectors=buf, scale=i8_scale, n_real=n, approx_recall=0.95)
    out8 = dense_search(idx8, SearchQueries(vector=jq), top_k=k)
    got8 = np.asarray(out8.indices)
    rec8 = float(np.mean(
        [len(set(got8[i].tolist()) & set(gt_i[i].tolist())) / k for i in range(args.n_eval)]
    ))
    sfn8 = jax.jit(lambda ix, v: dense_search(ix, SearchQueries(vector=v), top_k=k).indices)
    sfn8_blocks = jax.jit(
        lambda ix, qb: jax.lax.map(lambda v: dense_search(ix, SearchQueries(vector=v), top_k=k).indices, qb)
    )
    np.asarray(sfn8(idx8, p1[0])[0, 0])
    np.asarray(sfn8_blocks(idx8, p2[0])[0, 0, 0])
    w1 = w2 = float("inf")
    for i in range(3):
        t = time.time(); np.asarray(sfn8(idx8, p1[i])[-1]); w1 = min(w1, time.time() - t)
        t = time.time(); np.asarray(sfn8_blocks(idx8, p2[i])[-1, -1]); w2 = min(w2, time.time() - t)
    qps8 = (blocks * block - small) / max(w2 - w1, 1e-9)
    print(json.dumps({
        "codec": "int8-flat", "n": n, "bytes_per_vec": d,
        "hbm_gb": round(n_pad * d / 2**30, 2),
        "recall10": round(rec8, 4), "qps": round(qps8),
        "build_s": round(time.time() - t0, 1),
    }))


if __name__ == "__main__":
    main()
