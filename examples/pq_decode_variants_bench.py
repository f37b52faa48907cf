"""Exhaustive-ADC decode variants at 8.8M: bf16 vs int8 one-hot MXU decode.

The one-hot decode einsum dominates the exhaustive-ADC scan. int8 narrows it
twice over bf16: the materialized [chunk, M, 256] one-hot temp halves (HBM
traffic) and the int8 MXU runs at 2x the bf16 rate. Because a one-hot matmul
just SELECTS codebook entries, `onehot_i8 @ quantize_i8(cb)` equals the int8-
quantized codebook value exactly — the only new error is the per-subspace
codebook quantization (<1%), which the refine stage erases anyway.

Variants (all same codes, same exact-f32 GT):
  bf16-oh           one-hot bf16 decode + bf16 scan   (production today)
  i8-oh/bf16-scan   one-hot int8 decode -> bf16 scan  (scale folded into q)
  i8-oh/i8-scan     one-hot int8 decode -> int8 scan  (row-quantized queries)

Run: python examples/pq_decode_variants_bench.py [--n 8841823]
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
    ap.add_argument("--m", type=int, default=64)
    ap.add_argument("--train", type=int, default=262_144)
    ap.add_argument("--kmeans_iters", type=int, default=6)
    ap.add_argument("--n_eval", type=int, default=64)
    ap.add_argument("--chunks", type=str, default="8192,16384")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vod_tpu.ops import pq as pq_ops
    from vod_tpu.search.dense import _scan_topk

    n, d, m, k = args.n, args.d, args.m, 10
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
    codebooks = pq_ops.train_pq(jax.random.PRNGKey(0), train, m, n_iters=args.kmeans_iters)
    del train
    print(f"# trained pq{m} in {time.time()-t0:.0f}s", flush=True)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def fill(codes, key, row0, codebooks, basis):
        return jax.lax.dynamic_update_slice(
            codes, pq_ops.encode_pq(codebooks, gen_slab(key, basis)), (row0, 0)
        )

    codes = jnp.zeros((n_pad, m), jnp.uint8)
    for i, kk in enumerate(keys):
        codes = fill(codes, kk, jnp.int32(i * slab), codebooks, basis)
    codes.block_until_ready()

    # int8 codebooks: per-subspace symmetric scale
    cb_absmax = jnp.max(jnp.abs(codebooks), axis=(1, 2), keepdims=True)  # [M,1,1]
    cb_scale = jnp.maximum(cb_absmax, 1e-8) / 127.0
    cb_i8 = jnp.clip(jnp.round(codebooks / cb_scale), -127, 127).astype(jnp.int8)

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

    iota = jnp.arange(256, dtype=jnp.int32)
    # per-dim scale vector [768] expanding cb_scale over each subspace's dims
    scale_vec = jnp.repeat(cb_scale[:, 0, 0], d // m)

    def bf16_oh(codes_, qv, chunk):
        q_mm = qv.astype(jnp.bfloat16)
        cb = codebooks.astype(jnp.bfloat16)

        def score_chunk(start):
            c = jax.lax.dynamic_slice_in_dim(codes_, start, chunk, axis=0)
            oh = (c.astype(jnp.int32)[:, :, None] == iota[None, None, :]).astype(jnp.bfloat16)
            dec = jnp.einsum("cmk,mkd->cmd", oh, cb, preferred_element_type=jnp.bfloat16)
            return jnp.dot(q_mm, dec.reshape(chunk, -1).T, preferred_element_type=jnp.float32)

        return _scan_topk(score_chunk, n_pad, n, qv.shape[0], k, chunk, approx_recall=0.95)[1]

    def i8_oh_bf16_scan(codes_, qv, chunk):
        # fold the per-subspace codebook scale into the query
        q_mm = (qv.astype(jnp.float32) * scale_vec).astype(jnp.bfloat16)

        def score_chunk(start):
            c = jax.lax.dynamic_slice_in_dim(codes_, start, chunk, axis=0)
            oh = (c.astype(jnp.int32)[:, :, None] == iota[None, None, :]).astype(jnp.int8)
            dec = jnp.einsum("cmk,mkd->cmd", oh, cb_i8, preferred_element_type=jnp.int32)
            dec = dec.reshape(chunk, -1).astype(jnp.bfloat16)
            return jnp.dot(q_mm, dec.T, preferred_element_type=jnp.float32)

        return _scan_topk(score_chunk, n_pad, n, qv.shape[0], k, chunk, approx_recall=0.95)[1]

    def i8_oh_i8_scan(codes_, qv, chunk):
        q_f = qv.astype(jnp.float32) * scale_vec
        q_row = jnp.maximum(jnp.max(jnp.abs(q_f), axis=-1, keepdims=True), 1e-8) / 127.0
        q_i8 = jnp.clip(jnp.round(q_f / q_row), -127, 127).astype(jnp.int8)

        def score_chunk(start):
            c = jax.lax.dynamic_slice_in_dim(codes_, start, chunk, axis=0)
            oh = (c.astype(jnp.int32)[:, :, None] == iota[None, None, :]).astype(jnp.int8)
            dec = jnp.einsum("cmk,mkd->cmd", oh, cb_i8, preferred_element_type=jnp.int32)
            dec = dec.reshape(chunk, -1).astype(jnp.int8)  # values are int8-ranged
            acc = jax.lax.dot_general(
                q_i8, dec, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
            )
            return acc.astype(jnp.float32) * q_row

        return _scan_topk(score_chunk, n_pad, n, qv.shape[0], k, chunk, approx_recall=0.95)[1]

    def make_queries(nq, seed=0):
        r = np.random.default_rng(seed)
        base = np.tile(q, (-(-nq // args.n_eval), 1))[:nq]
        out_q = base + 1e-3 * r.standard_normal((nq, d)).astype(np.float32)
        return out_q / np.linalg.norm(out_q, axis=1, keepdims=True)

    small, block, blocks = 256, 2048, 4
    p1 = [jnp.asarray(make_queries(small, seed=i)) for i in range(3)]
    p2 = [jnp.asarray(np.stack([make_queries(block, seed=50 + 7 * i + j) for j in range(blocks)]))
          for i in range(3)]

    variants = {"bf16-oh": bf16_oh, "i8-oh/bf16-scan": i8_oh_bf16_scan,
                "i8-oh/i8-scan": i8_oh_i8_scan}
    for chunk in [int(c) for c in args.chunks.split(",")]:
        for name, fn in variants.items():
            f = jax.jit(functools.partial(fn, chunk=chunk))
            got = np.asarray(f(codes, jq))
            recall = float(np.mean(
                [len(set(got[i].tolist()) & set(gt_i[i].tolist())) / k
                 for i in range(args.n_eval)]
            ))
            fb = jax.jit(lambda cc, qb, fn=fn, chunk=chunk: jax.lax.map(
                lambda v: fn(cc, v, chunk), qb))
            np.asarray(f(codes, p1[0])[0, 0])
            np.asarray(fb(codes, p2[0])[0, 0, 0])
            w1 = w2 = float("inf")
            for i in range(3):
                t = time.time(); np.asarray(f(codes, p1[i])[-1]); w1 = min(w1, time.time() - t)
                t = time.time(); np.asarray(fb(codes, p2[i])[-1, -1]); w2 = min(w2, time.time() - t)
            qps = (blocks * block - small) / max(w2 - w1, 1e-9)
            print(json.dumps({
                "variant": name, "chunk": chunk, "n": n,
                "recall10": round(recall, 4), "qps": round(qps),
            }), flush=True)


if __name__ == "__main__":
    main()
