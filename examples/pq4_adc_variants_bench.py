"""4-bit exhaustive-ADC formulation shootout at 8.8M (pq128x4fs geometry).

Three mathematically near-identical ways to score q against PQ4 codes, with
very different TPU cost shapes (M=128 subquantizers, 16-entry codebooks,
D=768, so the flat one-hot width is M*16 = 2048):

  prod       per-subspace one-hot einsum decode ([chunk,16]@[16,6] per m —
             MXU-hostile tiles) + int8 score matmul. Production today.
  blockdiag  one-hot [chunk, 2048] @ blockdiag(cb) [2048, 768] — ONE well-
             shaped int8 MXU matmul for the decode — + int8 score matmul.
             Identical output to `prod` (the blockdiag zeros select nothing).
  direct     scores = one-hot [chunk, 2048] @ lut [2048, B]: the ADC LUT sum
             AS the matmul, no decode at all. Cost 2048*B MACs/row vs
             decode's fixed 2048*768 + 768*B — algebra says direct wins for
             B < ~1200, decode for larger (amortized) batches.

All variants share codes + exact-f32 ground truth; pool recall@10 is the
fraction of GT top-10 present in the collected k_factor*k candidate pool
(the refine stage then fixes the order, as in production).

MEASURED (v5e-1, 8.8M x 768, chunk 65536): the FLOP model is wrong — `prod`
wins everywhere. Serving B=64: prod 61 ms/block (1045 QPS) vs blockdiag 281
vs direct 216; throughput 4x2048: prod 12.2k QPS vs 6.2k vs 3.7k; amortized
1x8192 @ chunk 16384: 6.3k/7.0k — chunk-size loss dominates any decode
amortization. XLA lowers the per-subspace einsum efficiently, while the flat
[chunk, 2048] one-hot (128 MB @ 65536) becomes an explicit low-intensity HBM
operand for both alternatives. Conclusion: keep the einsum path; small-batch
serving wants CELL PRUNING (IVF), not a cheaper exhaustive formulation.

Run: python examples/pq4_adc_variants_bench.py [--n 8841823]
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
    ap.add_argument("--m", type=int, default=128)
    ap.add_argument("--train", type=int, default=262_144)
    ap.add_argument("--n_eval", type=int, default=64)
    ap.add_argument("--pool", type=int, default=320)  # k_factor 32 * k 10
    ap.add_argument("--chunk", type=int, default=65536)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vod_tpu.ops import pq as pq_ops
    from vod_tpu.search.dense import _pack_codes4, _scan_collect_topk, _unpack_codes4

    n, d, m, k = args.n, args.d, args.m, 10
    n_slabs = 8
    slab = -(-(-(-n // n_slabs)) // 16384) * 16384
    n_pad = slab * n_slabs

    spec_np = np.exp(-np.arange(d) / 35.0).astype(np.float32)
    spec = jnp.asarray(spec_np)
    basis, _ = jnp.linalg.qr(jax.random.normal(jax.random.PRNGKey(99), (d, d)))
    basis = basis.astype(jnp.float32)

    # NOTE (remote-relay): big arrays ride as jit ARGUMENTS — closures embed
    # as program literals, shipped at ~100 s/MB per compile (bench.py).
    @jax.jit
    def gen_slab(key, basis):
        z = jax.random.normal(key, (slab, d), dtype=jnp.float32) * spec
        x = z @ basis
        return x / jnp.linalg.norm(x, axis=-1, keepdims=True)

    keys = [jax.random.PRNGKey(2000 + i) for i in range(n_slabs)]

    t0 = time.time()
    train = gen_slab(keys[0], basis)[: args.train]
    codebooks = pq_ops.train_pq(jax.random.PRNGKey(0), train, m, n_codes=16, n_iters=6)
    del train
    print(f"# trained pq{m}x4 in {time.time()-t0:.0f}s", flush=True)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def fill(codes, key, row0, codebooks, basis):
        return jax.lax.dynamic_update_slice(
            codes, _pack_codes4(pq_ops.encode_pq(codebooks, gen_slab(key, basis))), (row0, 0)
        )

    codes = jnp.zeros((n_pad, m // 2), jnp.uint8)
    for i, kk in enumerate(keys):
        codes = fill(codes, kk, jnp.int32(i * slab), codebooks, basis)
    codes.block_until_ready()
    print("# codes built", flush=True)

    # int8 codebooks, per-subspace symmetric scale (as production)
    cb_absmax = jnp.max(jnp.abs(codebooks), axis=(1, 2), keepdims=True)  # [M,1,1]
    cb_scale = jnp.maximum(cb_absmax, 1e-8) / 127.0
    cb_i8 = jnp.clip(jnp.round(codebooks / cb_scale), -127, 127).astype(jnp.int8)
    scale_vec = jnp.repeat(cb_scale[:, 0, 0], d // m)  # [768]
    dsub = d // m

    # blockdiag [M*16, D] int8: row m*16+j holds cb_i8[m, j] in its subspace slot
    bd = np.zeros((m * 16, d), np.int8)
    cb_np = np.asarray(cb_i8)
    for mm in range(m):
        bd[mm * 16 : (mm + 1) * 16, mm * dsub : (mm + 1) * dsub] = cb_np[mm]
    cb_bd = jnp.asarray(bd)

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

    iota16 = jnp.arange(16, dtype=jnp.int32)

    def _collect(score_chunk, b, chunk):
        return _scan_collect_topk(
            score_chunk, n_pad, n, b, args.pool, chunk, approx_recall=0.95
        )[1]

    def prod(codes_, qv, chunk):
        q_f = qv.astype(jnp.float32) * scale_vec
        q_row = jnp.maximum(jnp.max(jnp.abs(q_f), axis=-1, keepdims=True), 1e-8) / 127.0
        q_i8 = jnp.clip(jnp.round(q_f / q_row), -127, 127).astype(jnp.int8)

        def score_chunk(start):
            c = _unpack_codes4(jax.lax.dynamic_slice_in_dim(codes_, start, chunk, axis=0))
            oh = (c.astype(jnp.int32)[:, :, None] == iota16[None, None, :]).astype(jnp.int8)
            dec = jnp.einsum("cmk,mkd->cmd", oh, cb_i8, preferred_element_type=jnp.int32)
            dec = dec.reshape(chunk, -1).astype(jnp.int8)
            acc = jax.lax.dot_general(
                q_i8, dec, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
            )
            return acc.astype(jnp.float32) * q_row

        return _collect(score_chunk, qv.shape[0], chunk)

    def blockdiag(codes_, qv, chunk):
        q_f = qv.astype(jnp.float32) * scale_vec
        q_row = jnp.maximum(jnp.max(jnp.abs(q_f), axis=-1, keepdims=True), 1e-8) / 127.0
        q_i8 = jnp.clip(jnp.round(q_f / q_row), -127, 127).astype(jnp.int8)

        def score_chunk(start):
            c = _unpack_codes4(jax.lax.dynamic_slice_in_dim(codes_, start, chunk, axis=0))
            oh = (c.astype(jnp.int32)[:, :, None] == iota16[None, None, :]).astype(jnp.int8)
            oh = oh.reshape(chunk, m * 16)
            dec = jax.lax.dot_general(  # [chunk, 2048] @ [2048, D] -> [chunk, D]
                oh, cb_bd, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            ).astype(jnp.int8)
            acc = jax.lax.dot_general(
                q_i8, dec, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
            )
            return acc.astype(jnp.float32) * q_row

        return _collect(score_chunk, qv.shape[0], chunk)

    def direct(codes_, qv, chunk):
        # lut[b, m, j] = q_sub[b, m] . cb[m, j]  (f32), then per-row int8 quant
        q_sub = qv.astype(jnp.float32).reshape(qv.shape[0], m, dsub)
        lut = jnp.einsum("bmd,mjd->bmj", q_sub, codebooks, preferred_element_type=jnp.float32)
        lut = lut.reshape(qv.shape[0], m * 16)
        l_row = jnp.maximum(jnp.max(jnp.abs(lut), axis=-1, keepdims=True), 1e-8) / 127.0
        lut_i8 = jnp.clip(jnp.round(lut / l_row), -127, 127).astype(jnp.int8)

        def score_chunk(start):
            c = _unpack_codes4(jax.lax.dynamic_slice_in_dim(codes_, start, chunk, axis=0))
            oh = (c.astype(jnp.int32)[:, :, None] == iota16[None, None, :]).astype(jnp.int8)
            oh = oh.reshape(chunk, m * 16)
            acc = jax.lax.dot_general(  # [B, 2048] @ [2048, chunk]^T
                lut_i8, oh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
            )
            return acc.astype(jnp.float32) * l_row

        return _collect(score_chunk, qv.shape[0], chunk)

    def make_queries(nq, seed=0):
        r = np.random.default_rng(seed)
        base = np.tile(q, (-(-nq // args.n_eval), 1))[:nq]
        out_q = base + 1e-3 * r.standard_normal((nq, d)).astype(np.float32)
        return out_q / np.linalg.norm(out_q, axis=1, keepdims=True)

    variants = {"prod": prod, "blockdiag": blockdiag, "direct": direct}

    # ---- serving latency: marginal cost of a 64-query block ----------------
    # lax.map over nb blocks of 64 inside one dispatch; difference 9 vs 1
    # blocks to cancel the dispatch RTT -> honest sequential small-batch QPS.
    sb = 64
    p_small = [
        (jnp.asarray(make_queries(sb, seed=i)[None]),
         jnp.asarray(np.stack([make_queries(sb, seed=10 + 9 * i + j) for j in range(9)])))
        for i in range(3)
    ]
    for name, fn in variants.items():
        fb = jax.jit(lambda cc, qb, fn=fn: jax.lax.map(
            lambda v: fn(cc, v, args.chunk), qb))
        got = np.asarray(fb(codes, p_small[0][0])[0])
        recall = float(np.mean(
            [len(set(got[i].tolist()) & set(gt_i[i].tolist())) / k
             for i in range(args.n_eval)]
        ))
        np.asarray(fb(codes, p_small[0][1])[0, 0, 0])  # warm 9-block shape
        w1 = w9 = float("inf")
        for i in range(3):
            one, nine = p_small[i]
            t = time.time(); np.asarray(fb(codes, one)[-1, -1]); w1 = min(w1, time.time() - t)
            t = time.time(); np.asarray(fb(codes, nine)[-1, -1]); w9 = min(w9, time.time() - t)
        ms_block = (w9 - w1) / 8 * 1000
        print(json.dumps({
            "variant": name, "mode": f"serving B={sb}", "chunk": args.chunk,
            "pool_recall10": round(recall, 4),
            "ms_per_block": round(ms_block, 1), "qps": round(sb / (ms_block / 1000)),
        }), flush=True)

    # ---- throughput: 2048-query blocks (bench.py methodology) --------------
    small, block, blocks = 256, 2048, 4
    p1 = [jnp.asarray(make_queries(small, seed=i)) for i in range(3)]
    p2 = [jnp.asarray(np.stack([make_queries(block, seed=50 + 7 * i + j) for j in range(blocks)]))
          for i in range(3)]
    for name, fn in variants.items():
        f = jax.jit(functools.partial(fn, chunk=args.chunk))
        fb = jax.jit(lambda cc, qb, fn=fn: jax.lax.map(
            lambda v: fn(cc, v, args.chunk), qb))
        np.asarray(f(codes, p1[0])[0, 0])
        np.asarray(fb(codes, p2[0])[0, 0, 0])
        w1 = w2 = float("inf")
        for i in range(3):
            t = time.time(); np.asarray(f(codes, p1[i])[-1]); w1 = min(w1, time.time() - t)
            t = time.time(); np.asarray(fb(codes, p2[i])[-1, -1]); w2 = min(w2, time.time() - t)
        qps = (blocks * block - small) / max(w2 - w1, 1e-9)
        print(json.dumps({
            "variant": name, "mode": "throughput 4x2048", "chunk": args.chunk,
            "qps": round(qps),
        }), flush=True)

    # ---- throughput, decode amortized: ONE 8192-query scan pass ------------
    # (vs lax.map re-decoding per 2048 block). Only decode variants benefit.
    p_big = [jnp.asarray(make_queries(8192, seed=200 + i)) for i in range(3)]
    for name, fn in variants.items():
        if name == "direct":
            continue
        chunk_b = 16384  # [8192, chunk] f32 scores temp = 512MB cap
        f = jax.jit(functools.partial(fn, chunk=chunk_b))
        fs = jax.jit(functools.partial(fn, chunk=chunk_b))
        np.asarray(f(codes, p_big[0])[0, 0])
        np.asarray(fs(codes, p1[0])[0, 0])
        w1 = w2 = float("inf")
        for i in range(3):
            t = time.time(); np.asarray(fs(codes, p1[i])[-1]); w1 = min(w1, time.time() - t)
            t = time.time(); np.asarray(f(codes, p_big[i])[-1]); w2 = min(w2, time.time() - t)
        qps = (8192 - small) / max(w2 - w1, 1e-9)
        print(json.dumps({
            "variant": name, "mode": "throughput 1x8192", "chunk": chunk_b,
            "qps": round(qps),
        }), flush=True)


if __name__ == "__main__":
    main()
