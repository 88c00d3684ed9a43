"""Round-3 probe: "quantum scatter" partition v3 vs the v2 ring kernel.

v2 (ops/partition.py) is correct but slow (49-67 ms at 4.72M): the f32
HIGHEST tri matmul and the per-bucket ring RMW dominate. v3 removes all
cross-chunk state: each chunk owns a static per-bucket quantum q in the
output; pad columns carry sentinels and the batched per-bucket sort (which
follows immediately at both call sites) sinks them. Larger sort (h = B*q/C
headroom) is traded for a kernel that is two bf16 one-hot matmuls + one
f32 permutation matmul per chunk, fully pipelined.

Run: cd /root/repo && python scratch/probe_partition4.py [--cpu]
"""

import functools
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def cdiv(a, b):
    return -(-a // b)


def _tri_incl_bf16(n):
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    return (row >= col).astype(jnp.bfloat16)


def _qpart_kernel(nv_ref, x_ref, out_ref, counts_ref, drops_ref, smem, *,
                  C, B, q, W, Wp, n_chunks, key_row, sentinels, bucket_mod,
                  bucket_shift, drop_key_above, layout_nt):
    g = pl.program_id(0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)

    @pl.when(g == 0)
    def _():
        for b in range(B):
            smem[0, b] = 0
            smem[1, b] = 0

    data = x_ref[...]                                         # (16, C)
    key_f = data[key_row:key_row + 1, :]
    key_i = key_f.astype(jnp.int32)
    if bucket_shift:
        key_i = jax.lax.shift_right_logical(key_i, bucket_shift)
    bid = jnp.bitwise_and(key_i, B - 1)                       # (1, C)

    keep = (g * C + lanes) < nv_ref[0]
    if drop_key_above is not None:
        keep = keep & (key_f < jnp.float32(drop_key_above))
    data = jnp.where(keep, data, 0.0)
    # row 15 becomes the validity carrier through the permutation matmul
    data = jnp.concatenate([data[:15, :], keep.astype(jnp.float32)], axis=0)

    bcols = jax.lax.broadcasted_iota(jnp.int32, (C, B), 1)
    # keep is cast to f32 BEFORE the (C, 1) reshape: Mosaic only supports
    # minor-dim insertion reshapes for 32-bit types, not i1 masks.
    keep_col = keep.astype(jnp.float32).reshape(C, 1)
    onehot = (bid.reshape(C, 1) == bcols).astype(
        jnp.float32) * keep_col                               # (C, B)
    incl = jax.lax.dot_general(                               # (C, B) exact:
        _tri_incl_bf16(C), onehot.astype(jnp.bfloat16),       # 0/1 inputs,
        (((1,), (0,)), ((), ())),                             # f32 accum
        preferred_element_type=jnp.float32)
    rank = incl - onehot                                      # exclusive
    rankv = jnp.sum(onehot * rank, axis=1)                    # (C,)
    cntb = incl[C - 1:C, :]                                   # (1, B)

    dest = bid[0].astype(jnp.float32) * q + rankv             # (C,)
    dest = jnp.where(rankv >= q, jnp.float32(W), dest)        # overflow->dump
    lanesWp = jax.lax.broadcasted_iota(jnp.int32, (C, Wp), 1)
    perm = (dest.astype(jnp.int32).reshape(C, 1)
            == lanesWp).astype(jnp.float32)                   # (C, Wp)
    part = jax.lax.dot_general(                               # (16, Wp)
        data, perm, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)

    lanesW = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
    region = lanesW // q
    sent = jnp.zeros((1, W), jnp.float32)
    for b in range(B):
        sent = jnp.where(region == b, jnp.float32(sentinels[b]), sent)
    validW = part[15:16, :W] > 0.5
    key_out = jnp.where(validW, part[key_row:key_row + 1, :W], sent)
    if key_row == 0:
        assembled = jnp.concatenate([key_out, part[1:, :W]], axis=0)
    elif key_row == 15:
        assembled = jnp.concatenate([part[:15, :W], key_out], axis=0)
    else:
        assembled = jnp.concatenate(
            [part[:key_row, :W], key_out, part[key_row + 1:, :W]], axis=0)

    if layout_nt:
        for b in range(B):
            out_ref[b] = assembled[:, b * q:(b + 1) * q]
    else:
        out_ref[...] = assembled

    kept = jnp.minimum(cntb, jnp.float32(q))
    for b in range(B):
        smem[0, b] = smem[0, b] + kept[0, b].astype(jnp.int32)
        smem[1, b] = smem[1, b] + (cntb[0, b] - kept[0, b]).astype(jnp.int32)

    @pl.when(g == n_chunks - 1)
    def _():
        for b in range(B):
            counts_ref[0, b] = smem[0, b]
            drops_ref[0, b] = smem[1, b]


@functools.lru_cache(maxsize=None)
def _make_qpart(M, C, B, q, key_row, sentinels, bucket_shift,
                drop_key_above, layout_nt, interpret):
    n_chunks = M // C
    W = B * q
    Wp = cdiv(W + 128, 128) * 128
    if layout_nt:
        out_spec = pl.BlockSpec((B, 16, q), lambda g, *_: (0, 0, g),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((B, 16, n_chunks * q), jnp.float32)
    else:
        out_spec = pl.BlockSpec((16, W), lambda g, *_: (0, g),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((16, n_chunks * W), jnp.float32)
    return pl.pallas_call(
        functools.partial(_qpart_kernel, C=C, B=B, q=q, W=W, Wp=Wp,
                          n_chunks=n_chunks, key_row=key_row,
                          sentinels=sentinels, bucket_mod=B,
                          bucket_shift=bucket_shift,
                          drop_key_above=drop_key_above,
                          layout_nt=layout_nt),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_chunks,),
            in_specs=[pl.BlockSpec((16, C), lambda g, *_: (0, g),
                                   memory_space=pltpu.VMEM)],
            out_specs=[
                out_spec,
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            scratch_shapes=[pltpu.SMEM((2, B), jnp.int32)],
        ),
        out_shape=[
            out_shape,
            jax.ShapeDtypeStruct((1, B), jnp.int32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
        ],
        interpret=interpret,
    )


def qpartition(x, B, q, *, key_row=0, sentinel, C=512, bucket_shift=0,
               n_valid=None, drop_key_above=None, layout_nt=False,
               interpret=None):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    M = x.shape[1]
    assert M % C == 0
    if isinstance(sentinel, (int, float)):
        sentinels = (float(sentinel),) * B
    else:
        sentinels = tuple(float(s) for s in sentinel)
    nv = jnp.full((1,), M, jnp.int32) if n_valid is None else (
        jnp.asarray(n_valid, jnp.int32).reshape(1))
    call = _make_qpart(M, C, B, q, key_row, sentinels, bucket_shift,
                       float(drop_key_above) if drop_key_above is not None
                       else None, layout_nt, bool(interpret))
    out, counts, drops = call(nv, x)
    n_chunks = M // C
    if layout_nt:
        rows = out  # (B, 16, n_chunks*q)
        rows = jnp.swapaxes(rows, 0, 1)  # (16, B, cap)
    else:
        rows = jnp.swapaxes(
            out.reshape(16, n_chunks, B, q), 1, 2).reshape(
            16, B, n_chunks * q)
    return rows, counts[0], drops[0]


def check_correctness():
    print("== correctness (interpret) ==", flush=True)
    rng = np.random.default_rng(1)
    M, C, B, q = 4096, 512, 8, 96
    T = 777
    k_np = rng.integers(0, T, size=(M,))
    x = rng.normal(size=(16, M)).astype(np.float32)
    x[0] = k_np
    x[12:] = 0.0
    nv = M - 100
    xj = jnp.asarray(x)
    rows, counts, drops = qpartition(
        xj, B, q, key_row=0, sentinel=float(T), C=C,
        n_valid=nv, drop_key_above=float(T), interpret=True)
    assert int(drops.sum()) == 0, drops
    # reference: per-bucket stable-by-input-order collections
    ref = [[] for _ in range(B)]
    for j in range(nv):
        ref[int(k_np[j]) % B].append(j)
    total_ref = sum(len(r) for r in ref)
    assert int(counts.sum()) == total_ref, (counts, total_ref)
    rows_np = np.asarray(rows)
    for b in range(B):
        cols = rows_np[:, b, :]
        valid = cols[0] < T
        assert valid.sum() == len(ref[b]), (b, valid.sum(), len(ref[b]))
        got = cols[:, valid]
        want = x[:, ref[b]]
        # stable: quantum layout preserves chunk order; within chunk order
        np.testing.assert_allclose(got[:12], want[:12], rtol=0, atol=0)
        # sentinels on pads
        assert np.all(cols[0][~valid] == T)
        assert np.all(cols[1:12][:, ~valid] == 0)
    print("qpartition correct (stable, exact, sentinels ok)", flush=True)


def bench():
    from gaussian_splatting_tpu.utils.cache import enable_compile_cache
    from gaussian_splatting_tpu.utils.profiling import time_fn_device

    enable_compile_cache()
    rng = np.random.default_rng(0)
    M = 4_718_592
    T = 8160
    k_np = rng.integers(0, T, size=(M,))
    x = rng.normal(size=(16, M)).astype(np.float32)
    x[0] = k_np
    x[12:] = 0.0
    xj = jnp.asarray(x)

    for layout_nt in (False,):
        for C, B, q in ((512, 8, 96), (512, 8, 128), (512, 16, 48),
                        (1024, 8, 192), (256, 8, 64)):
            name = f"NT={int(layout_nt)} C={C} B={B} q={q} h={B*q/C:.2f}"
            try:
                def part_only(s, xx, B=B, q=q, C=C, nt=layout_nt):
                    xx = xx.at[1].mul(1.0 + (s - 1.0) * 1e-9)
                    return qpartition(xx, B, q, key_row=0, sentinel=float(T),
                                      C=C, drop_key_above=float(T),
                                      layout_nt=nt, interpret=False)

                rows, counts, drops = jax.jit(
                    lambda xx: part_only(1.0, xx))(xj)
                nd = int(np.asarray(drops).sum())
                dt = time_fn_device(part_only, (xj,), reps=6)
                print(f"partition {name}: {dt*1e3:6.1f} ms  drops={nd}",
                      flush=True)

                def part_sort(s, xx, B=B, q=q, C=C, nt=layout_nt):
                    rows, counts, drops = part_only(s, xx, B, q, C, nt)
                    ops = tuple(rows[r] for r in range(12))
                    srt = jax.lax.sort(ops, num_keys=2, dimension=1)
                    return srt, counts

                dt = time_fn_device(part_sort, (xj,), reps=6)
                print(f"part+sort {name}: {dt*1e3:6.1f} ms", flush=True)
            except Exception as e:
                print(f"{name}: FAILED {type(e).__name__}: {e}",
                      flush=True)


if __name__ == "__main__":
    if "--cpu" in sys.argv:
        check_correctness()
    else:
        bench()
