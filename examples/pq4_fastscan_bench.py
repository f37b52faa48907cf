"""4-bit PQ ("fast-scan") prototype at 8.8M: pq128x4 vs pq64x8 exhaustive ADC.

faiss's modern default compressed codec is 4-bit fast-scan PQ (`PQ128x4fs`):
16-entry codebooks scored from SIMD registers. The TPU analog of the register
LUT is the one-hot MXU decode — and 4-bit codes shrink the one-hot temp 16x
([chunk, M, 16] vs [chunk, M, 256]), which is exactly the HBM+VPU wall of the
8-bit exhaustive-ADC scan (see examples/pq_decode_variants_bench.py).

At equal 64 B/vec (pq64x8 == packed pq128x4), variants measured:
  pq64x8-i8      8-bit one-hot int8 decode + int8 scan   (production today)
  pq128x4-i8     4-bit one-hot int8 decode + int8 scan   (same structure, K=16)
  pq128x4-g8     4-bit grouped decode: 8 subspaces per matmul (K=128 one-hot
                 blocks vs a block-diagonal codebook — MXU-friendlier shapes)
  pq128x4-lutmm  no decode: scores = LUT_i8 [B, 2048] @ onehot.T (single
                 matmul, K=2048; FLOPs scale with B but shapes are perfect)

Reported per variant: ADC-only recall@10, pool containment (fraction of the
true top-10 inside the ADC top-`pool` — what survives an exact refine stage),
and scan QPS at k=pool.

Run: python examples/pq4_fastscan_bench.py [--n 8841823]
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
    ap.add_argument("--train", type=int, default=262_144)
    ap.add_argument("--kmeans_iters", type=int, default=6)
    ap.add_argument("--n_eval", type=int, default=64)
    ap.add_argument("--pool", type=int, default=160)
    ap.add_argument("--chunks", type=str, default="32768,65536")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vod_tpu.ops import pq as pq_ops
    from vod_tpu.search.dense import _scan_topk

    n, d, k, pool = args.n, args.d, 10, args.pool
    n_slabs = 8
    slab = -(-(-(-n // n_slabs)) // 16384) * 16384
    n_pad = slab * n_slabs

    spec_np = np.exp(-np.arange(d) / 35.0).astype(np.float32)
    spec = jnp.asarray(spec_np)
    basis, _ = jnp.linalg.qr(jax.random.normal(jax.random.PRNGKey(99), (d, d)))
    basis = basis.astype(jnp.float32)

    # NOTE (remote-relay): basis/codebooks ride as jit ARGUMENTS — closures
    # embed as program literals, shipped at ~100 s/MB per compile (bench.py).
    @jax.jit
    def gen_slab(key, basis):
        z = jax.random.normal(key, (slab, d), dtype=jnp.float32) * spec
        x = z @ basis
        return x / jnp.linalg.norm(x, axis=-1, keepdims=True)

    keys = [jax.random.PRNGKey(2000 + i) for i in range(n_slabs)]

    t0 = time.time()
    train = gen_slab(keys[0], basis)[: args.train]
    cb8 = pq_ops.train_pq(jax.random.PRNGKey(0), train, 64, n_iters=args.kmeans_iters)
    cb4 = pq_ops.train_pq(
        jax.random.PRNGKey(1), train, 128, n_codes=16, n_iters=args.kmeans_iters
    )
    del train
    print(f"# trained pq64x8 + pq128x4 in {time.time()-t0:.0f}s", flush=True)

    def fill_codes(cb, m):
        @functools.partial(jax.jit, donate_argnums=(0,))
        def fill(codes, key, row0, cb, basis):
            return jax.lax.dynamic_update_slice(
                codes, pq_ops.encode_pq(cb, gen_slab(key, basis)), (row0, 0)
            )

        codes = jnp.zeros((n_pad, m), jnp.uint8)
        for i, kk in enumerate(keys):
            codes = fill(codes, kk, jnp.int32(i * slab), cb, basis)
        codes.block_until_ready()
        return codes

    t0 = time.time()
    codes8 = fill_codes(cb8, 64)
    codes4 = fill_codes(cb4, 128)
    print(f"# encoded both in {time.time()-t0:.0f}s", flush=True)

    def int8_cb(cb):
        absmax = jnp.max(jnp.abs(cb), axis=(1, 2), keepdims=True)
        scale = jnp.maximum(absmax, 1e-8) / 127.0
        cb_i8 = jnp.clip(jnp.round(cb / scale), -127, 127).astype(jnp.int8)
        return cb_i8, jnp.repeat(scale[:, 0, 0], d // cb.shape[0])

    cb8_i8, svec8 = int8_cb(cb8)
    cb4_i8, svec4 = int8_cb(cb4)

    rng = np.random.default_rng(0)
    s0 = np.asarray(gen_slab(keys[0], basis)[: args.n_eval])
    noise = (rng.standard_normal((args.n_eval, d)).astype(np.float32) * spec_np) @ np.asarray(basis)
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

    def quant_queries(qv, svec):
        q_f = qv.astype(jnp.float32) * svec
        q_row = jnp.maximum(jnp.max(jnp.abs(q_f), axis=-1, keepdims=True), 1e-8) / 127.0
        q_i8 = jnp.clip(jnp.round(q_f / q_row), -127, 127).astype(jnp.int8)
        return q_i8, q_row

    def onehot_decode_scan(codes_, qv, chunk, cb_i8, svec, n_codes):
        iota = jnp.arange(n_codes, dtype=jnp.int32)
        q_i8, q_row = quant_queries(qv, svec)

        def score_chunk(start):
            c = jax.lax.dynamic_slice_in_dim(codes_, start, chunk, axis=0)
            oh = (c.astype(jnp.int32)[:, :, None] == iota[None, None, :]).astype(jnp.int8)
            dec = jnp.einsum("cmk,mkd->cmd", oh, cb_i8, preferred_element_type=jnp.int32)
            dec = dec.reshape(chunk, -1).astype(jnp.int8)
            acc = jax.lax.dot_general(
                q_i8, dec, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
            )
            return acc.astype(jnp.float32) * q_row

        return _scan_topk(score_chunk, n_pad, n, qv.shape[0], pool, chunk,
                          approx_recall=0.95)[1]

    def pq64_i8(codes_, qv, chunk):
        return onehot_decode_scan(codes_, qv, chunk, cb8_i8, svec8, 256)

    def pq4_i8(codes_, qv, chunk):
        return onehot_decode_scan(codes_, qv, chunk, cb4_i8, svec4, 16)

    # grouped decode: 8 subspaces per matmul. oh groups [chunk, 16, 128]
    # (8 stacked one-hot16s), block-diagonal codebook [16, 128, 48].
    g = 8
    n_grp = 128 // g  # 16 groups
    dsub4 = d // 128  # 6
    cb_bd = np.zeros((n_grp, g * 16, g * dsub4), np.int8)
    cb4_np = np.asarray(cb4_i8)
    for grp in range(n_grp):
        for j in range(g):
            cb_bd[grp, j * 16 : (j + 1) * 16, j * dsub4 : (j + 1) * dsub4] = cb4_np[
                grp * g + j
            ]
    cb_bd = jnp.asarray(cb_bd)

    def pq4_g8(codes_, qv, chunk):
        iota = jnp.arange(16, dtype=jnp.int32)
        q_i8, q_row = quant_queries(qv, svec4)

        def score_chunk(start):
            c = jax.lax.dynamic_slice_in_dim(codes_, start, chunk, axis=0)
            oh = (c.astype(jnp.int32)[:, :, None] == iota[None, None, :]).astype(jnp.int8)
            oh_g = oh.reshape(chunk, n_grp, g * 16)
            dec = jnp.einsum("cgk,gkd->cgd", oh_g, cb_bd, preferred_element_type=jnp.int32)
            dec = dec.reshape(chunk, -1).astype(jnp.int8)
            acc = jax.lax.dot_general(
                q_i8, dec, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
            )
            return acc.astype(jnp.float32) * q_row

        return _scan_topk(score_chunk, n_pad, n, qv.shape[0], pool, chunk,
                          approx_recall=0.95)[1]

    def pq4_lutmm(codes_, qv, chunk):
        iota = jnp.arange(16, dtype=jnp.int32)
        lut = pq_ops.adc_lut(cb4, qv)  # [B, 128, 16] f32 (float codebooks)
        lut_flat = lut.reshape(qv.shape[0], 128 * 16)
        l_row = jnp.maximum(jnp.max(jnp.abs(lut_flat), axis=-1, keepdims=True), 1e-8) / 127.0
        lut_i8 = jnp.clip(jnp.round(lut_flat / l_row), -127, 127).astype(jnp.int8)

        def score_chunk(start):
            c = jax.lax.dynamic_slice_in_dim(codes_, start, chunk, axis=0)
            oh = (c.astype(jnp.int32)[:, :, None] == iota[None, None, :]).astype(jnp.int8)
            oh_flat = oh.reshape(chunk, 128 * 16)
            acc = jax.lax.dot_general(
                lut_i8, oh_flat, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
            )
            return acc.astype(jnp.float32) * l_row

        return _scan_topk(score_chunk, n_pad, n, qv.shape[0], pool, chunk,
                          approx_recall=0.95)[1]

    def make_queries(nq, seed=0):
        r = np.random.default_rng(seed)
        base = np.tile(q, (-(-nq // args.n_eval), 1))[:nq]
        out_q = base + 1e-3 * r.standard_normal((nq, d)).astype(np.float32)
        return out_q / np.linalg.norm(out_q, axis=1, keepdims=True)

    small, block, blocks = 256, 2048, 4
    p1 = [jnp.asarray(make_queries(small, seed=i)) for i in range(3)]
    p2 = [jnp.asarray(np.stack([make_queries(block, seed=50 + 7 * i + j) for j in range(blocks)]))
          for i in range(3)]

    variants = {
        "pq64x8-i8": (pq64_i8, codes8, 64),
        "pq128x4-i8": (pq4_i8, codes4, 64),
        "pq128x4-g8": (pq4_g8, codes4, 64),
        "pq128x4-lutmm": (pq4_lutmm, codes4, 64),
    }
    for chunk in [int(c) for c in args.chunks.split(",")]:
        for name, (fn, codes_, bpv) in variants.items():
            f = jax.jit(functools.partial(fn, chunk=chunk))
            got = np.asarray(f(codes_, jq))
            rec = float(np.mean(
                [len(set(got[i, :k].tolist()) & set(gt_i[i].tolist())) / k
                 for i in range(args.n_eval)]
            ))
            contain = float(np.mean(
                [len(set(got[i].tolist()) & set(gt_i[i].tolist())) / k
                 for i in range(args.n_eval)]
            ))
            fb = jax.jit(lambda cc, qb, fn=fn, chunk=chunk: jax.lax.map(
                lambda v: fn(cc, v, chunk), qb))
            np.asarray(f(codes_, p1[0])[0, 0])
            np.asarray(fb(codes_, p2[0])[0, 0, 0])
            w1 = w2 = float("inf")
            for i in range(3):
                t = time.time(); np.asarray(f(codes_, p1[i])[-1]); w1 = min(w1, time.time() - t)
                t = time.time(); np.asarray(fb(codes_, p2[i])[-1, -1]); w2 = min(w2, time.time() - t)
            qps = (blocks * block - small) / max(w2 - w1, 1e-9)
            print(json.dumps({
                "variant": name, "chunk": chunk, "n": n, "bytes_per_vec": bpv,
                "adc_recall10": round(rec, 4), f"pool{pool}_containment": round(contain, 4),
                "qps": round(qps),
            }), flush=True)


if __name__ == "__main__":
    main()
