"""Microbench: segment-sum strategies on TPU for the band-grid assembly.

Candidates for seg_sum_blocks at flagship-fleet sizes (n ~ 200k rows of
(6,6) blocks into nseg ~ 25k segments):
  scatter          jax.ops.segment_sum (today's path)
  scatter_sorted   rows pre-permuted by segment id (host-static) +
                   indices_are_sorted=True
  onehot           one-hot matmul (today's small-nseg path)
  bucket_gather    host-precomputed (nseg, cap) row-index table ->
                   gather + sum (no scatter at all)
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=224000)
    ap.add_argument("--nseg", type=int, default=24576)
    ap.add_argument("--block", type=int, default=36)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    n, nseg, blk = args.n, args.nseg, args.block
    rng = np.random.default_rng(0)
    # realistic skew: ~70% of rows land on the d=0 diagonal band segments
    ids_np = np.where(rng.random(n) < 0.7,
                      rng.integers(0, nseg, n) // 24 * 24,
                      rng.integers(0, nseg, n)).astype(np.int32)
    vals = jnp.asarray(rng.normal(size=(n, blk)).astype(np.float32))
    ids = jnp.asarray(ids_np)

    perm_np = np.argsort(ids_np, kind="stable")
    perm = jnp.asarray(perm_np.astype(np.int32))
    ids_sorted = jnp.asarray(ids_np[perm_np])

    @jax.jit
    def scatter(vals):
        return jax.ops.segment_sum(vals, ids, num_segments=nseg)

    @jax.jit
    def scatter_sorted(vals):
        return jax.ops.segment_sum(vals[perm], ids_sorted,
                                   num_segments=nseg,
                                   indices_are_sorted=True)

    ref = np.asarray(scatter(vals))
    got = np.asarray(scatter_sorted(vals))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
    print(f"n={n} nseg={nseg} block={blk} "
          f"device={jax.devices()[0].device_kind!r}")
    print(f"  scatter          {timeit(scatter, vals):8.3f} ms")
    print(f"  scatter_sorted   {timeit(scatter_sorted, vals):8.3f} ms")

    # bucket_gather: pad each segment's rows to its bucket capacity
    counts = np.bincount(ids_np, minlength=nseg)
    cap = int(counts.max())
    print(f"  (bucket cap {cap}, fill "
          f"{n / max(nseg * cap, 1) * 100:.1f}%)")
    if nseg * cap <= 40_000_000:
        idx_tab = np.full((nseg, cap), n, np.int32)
        pos = np.zeros(nseg, np.int64)
        order = perm_np
        seg_sorted = ids_np[order]
        ofs = np.arange(n) - np.searchsorted(seg_sorted, seg_sorted)
        idx_tab[seg_sorted, ofs] = order
        idx_tab_j = jnp.asarray(idx_tab)

        @jax.jit
        def bucket(vals):
            v = jnp.concatenate([vals, jnp.zeros((1, blk), vals.dtype)], 0)
            return v[idx_tab_j].sum(axis=1)

        got = np.asarray(bucket(vals))
        np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)
        print(f"  bucket_gather    {timeit(bucket, vals):8.3f} ms")

    # two-level: sorted rows -> fixed-size chunks of size c summed by
    # reshape, then a short scatter of n/c partial sums
    for c in (8, 16):
        n_pad = -(-n // c) * c
        chunk_ids = ids_np[perm_np]
        chunk_ids = np.concatenate([chunk_ids,
                                    np.full(n_pad - n, nseg, np.int32)])
        first_of_chunk = jnp.asarray(chunk_ids.reshape(-1, c))
        # rows within a chunk may straddle segments -> a chunk contributes
        # one partial per distinct segment it contains; handle by scattering
        # each row's (c-summed?) -- only valid when chunks are segment-pure;
        # measure the pure-case upper bound instead:
        pure = (chunk_ids.reshape(-1, c) ==
                chunk_ids.reshape(-1, c)[:, :1]).all(1).mean()
        print(f"  (two-level c={c}: {pure * 100:.0f}% segment-pure chunks)")
    return


if __name__ == "__main__":
    main()


def chunk8_bench(n=310000, nseg=24576, blk=36, C=8, heavy_frac=0.7):
    """Host-planned sorted+padded chunk-C segment sum:
    gather rows into segment order (pad each segment to a multiple of C
    with a zero row), reshape-sum chunks, short sorted scatter."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)
    ids_np = np.where(rng.random(n) < heavy_frac,
                      rng.integers(0, nseg, n) // 24 * 24,
                      rng.integers(0, nseg, n)).astype(np.int32)
    vals = jnp.asarray(rng.normal(size=(n, blk)).astype(np.float32))

    order = np.argsort(ids_np, kind="stable")
    sids = ids_np[order]
    counts = np.bincount(ids_np, minlength=nseg)
    padded = -(-counts // C) * C
    padded = np.maximum(padded, 0)
    total = int(padded.sum())
    perm = np.full(total, n, np.int32)
    starts = np.concatenate([[0], np.cumsum(padded)[:-1]])
    seg_start_in_sorted = np.concatenate([[0], np.cumsum(counts)[:-1]])
    ofs = np.arange(n) - seg_start_in_sorted[sids]
    perm[starts[sids] + ofs] = order
    out_ids = np.repeat(np.arange(nseg), padded // C).astype(np.int32)
    perm_j = jnp.asarray(perm)
    out_ids_j = jnp.asarray(out_ids)

    @jax.jit
    def planned(vals):
        v2 = jnp.concatenate([vals, jnp.zeros((1, blk), vals.dtype)], 0)
        g = v2[perm_j].reshape(-1, C, blk).sum(axis=1)
        return jax.ops.segment_sum(g, out_ids_j, num_segments=nseg,
                                   indices_are_sorted=True)

    ids = jnp.asarray(ids_np)

    @jax.jit
    def scatter(vals):
        return jax.ops.segment_sum(vals, ids, num_segments=nseg)

    ref = np.asarray(scatter(vals))
    got = np.asarray(planned(vals))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
    print(f"chunk{C}: n={n} nseg={nseg} blk={blk} pad_total={total} "
          f"(x{total / n:.2f})")
    print(f"  scatter  {timeit(scatter, vals):8.3f} ms")
    print(f"  planned  {timeit(planned, vals):8.3f} ms")


if __name__ == "__main__" or True:
    pass
