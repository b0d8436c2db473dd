"""Pallas TPU kernels for the matching hot path.

``masked_hamming_best2``: fused XOR-popcount + masked best/second-best
reduction. The jnp path (ops/matching.py) materializes the full [Q, N]
int32 distance matrix in HBM three times over (xor, popcount-sum, masked
select); this kernel streams target tiles through VMEM and keeps only the
running (best, second, argbest) per query row — HBM traffic drops from
O(Q*N) to O(Q + N).

Falls back to the jnp implementation off-TPU (tests run on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1 << 20  # plain int: jnp constants may not be captured by pallas kernels


def _kernel(qdesc_ref, tdesc_ref, mask_q_ref, mask_t_ref, quv_ref, tuv_ref,
            rad_ref, qlvl_ref, tlvl_ref,
            best_ref, bidx_ref, second_ref, *, n_t_tiles, t_tile, level_tol):
    """One program handles a tile of queries against all target tiles.

    qdesc: [TQ,8] uint32; tdesc: [N,8]; masks/uv/levels per side.
    Outputs per query: best dist, best idx, second dist.
    """
    TQ = qdesc_ref.shape[0]

    best = jnp.full((TQ, 1), _BIG, jnp.int32)
    bidx = jnp.full((TQ, 1), -1, jnp.int32)
    second = jnp.full((TQ, 1), _BIG, jnp.int32)

    qd = qdesc_ref[:]                       # [TQ,8]
    qm = mask_q_ref[:]                      # [TQ,1] int32 (1=valid)
    quv = quv_ref[:]                        # [TQ,2]
    rad = rad_ref[:]                        # [TQ,1]
    qlvl = qlvl_ref[:]                      # [TQ,1]

    def body(t, carry):
        best, bidx, second = carry
        sl = pl.ds(t * t_tile, t_tile)
        td = tdesc_ref[sl, :]               # [TT,8]
        tm = mask_t_ref[sl, :]              # [TT,1]
        tuv = tuv_ref[sl, :]                # [TT,2]
        tlvl = tlvl_ref[sl, :]              # [TT,1]

        # pairwise Hamming: accumulate popcount over the 8 words
        dist = jnp.zeros((TQ, t_tile), jnp.int32)
        for w in range(8):
            x = jnp.bitwise_xor(qd[:, w][:, None], td[:, w][None, :])
            dist = dist + jax.lax.population_count(x).astype(jnp.int32)

        du = jnp.abs(quv[:, 0][:, None] - tuv[:, 0][None, :])
        dv = jnp.abs(quv[:, 1][:, None] - tuv[:, 1][None, :])
        dl = jnp.abs(qlvl[:, 0][:, None] - tlvl[:, 0][None, :])
        ok = (
            (du <= rad[:, 0][:, None])
            & (dv <= rad[:, 0][:, None])
            & (dl <= level_tol)
            & (qm[:, 0][:, None] > 0)
            & (tm[:, 0][None, :] > 0)
        )
        dist = jnp.where(ok, dist, _BIG)

        tile_best = jnp.min(dist, axis=1, keepdims=True)            # [TQ,1]
        # integer argmin (Mosaic argmin only supports f32): first column
        # achieving the min
        col = jax.lax.broadcasted_iota(jnp.int32, (TQ, t_tile), 1)
        tile_arg = jnp.min(
            jnp.where(dist == tile_best, col, t_tile), axis=1, keepdims=True
        )
        # second best within the tile: mask out the argmin column
        dist2 = jnp.where(col == tile_arg, _BIG, dist)
        tile_second = jnp.min(dist2, axis=1, keepdims=True)

        tile_arg = tile_arg + t * t_tile

        # merge running (best, second)
        new_best = jnp.minimum(best, tile_best)
        new_bidx = jnp.where(tile_best < best, tile_arg, bidx)
        new_second = jnp.minimum(
            jnp.maximum(tile_best, best),  # loser of the two bests
            jnp.minimum(second, tile_second),
        )
        return new_best, new_bidx, new_second

    best, bidx, second = jax.lax.fori_loop(
        0, n_t_tiles, body, (best, bidx, second)
    )
    best_ref[:] = best
    bidx_ref[:] = bidx
    second_ref[:] = second


@functools.partial(jax.jit, static_argnames=("level_tol",))
def masked_hamming_best2_tpu(
    qdesc, quv, qrad, qlvl, qvalid, tdesc, tuv, tlvl, tvalid, level_tol: int = 1
):
    """Pallas path. Shapes: q* [Q,...], t* [N,...]; Q, N multiples of 256
    (pad with invalid rows). Returns (bidx [Q], best [Q], second [Q])."""
    Q = qdesc.shape[0]
    N = tdesc.shape[0]
    TQ = 256
    TT = 256
    assert Q % TQ == 0 and N % TT == 0

    grid = (Q // TQ,)
    out = pl.pallas_call(
        functools.partial(
            _kernel, n_t_tiles=N // TT, t_tile=TT, level_tol=level_tol
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TQ, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TQ, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TQ, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TQ, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TQ, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TQ, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TQ, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TQ, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Q, 1), jnp.int32),
            jax.ShapeDtypeStruct((Q, 1), jnp.int32),
            jax.ShapeDtypeStruct((Q, 1), jnp.int32),
        ],
    )(
        qdesc.astype(jnp.uint32),
        tdesc.astype(jnp.uint32),
        qvalid.astype(jnp.int32)[:, None],
        tvalid.astype(jnp.int32)[:, None],
        quv.astype(jnp.float32),
        tuv.astype(jnp.float32),
        qrad.astype(jnp.float32)[:, None],
        qlvl.astype(jnp.int32)[:, None],
        tlvl.astype(jnp.int32)[:, None],
    )
    best, bidx, second = out[0][:, 0], out[1][:, 0], out[2][:, 0]
    return bidx, best, second


def masked_hamming_best2(
    qdesc, quv, qrad, qlvl, qvalid, tdesc, tuv, tlvl, tvalid, level_tol: int = 1
):
    """Dispatch: MXU bit-matmul path on TPU, jnp popcount elsewhere. Same
    contract as matching.best_two over the projection-window mask.

    The Pallas streaming kernel (``masked_hamming_best2_tpu`` above) is
    kept for reference, but it is NOT the production path: it computes
    Hamming distance on the VPU via xor+popcount, and as a custom call it
    pins operand layouts — composed with the in-loop ORB extraction that
    produces its inputs, XLA inserts per-iteration layout copies that cost
    ~12 ms/frame (measured). The MXU path expresses the same distance as
    one bf16 [Q,256]x[256,N] matmul (exact: 0/1 values, f32 accumulation)
    and fuses cleanly with neighbours.
    """
    platform = jax.devices()[0].platform
    Q, N = qdesc.shape[0], tdesc.shape[0]
    from . import matching

    if platform == "tpu":
        du = jnp.abs(quv[:, 0:1] - tuv[None, :, 0])
        dv = jnp.abs(quv[:, 1:2] - tuv[None, :, 1])
        mask = (
            (du <= qrad[:, None])
            & (dv <= qrad[:, None])
            & (jnp.abs(tlvl[None, :] - qlvl[:, None]) <= level_tol)
            & qvalid[:, None].astype(bool)
            & tvalid[None, :].astype(bool)
        )
        dist = matching.hamming_matrix_mxu(qdesc, tdesc)
        return matching.best_two(dist, mask)
    return _masked_hamming_best2_jnp(
        qdesc, quv, qrad, qlvl, qvalid, tdesc, tuv, tlvl, tvalid, level_tol
    )


def masked_hamming_best2_pallas(
    qdesc, quv, qrad, qlvl, qvalid, tdesc, tuv, tlvl, tvalid, level_tol: int = 1
):
    """Pallas streaming variant (see masked_hamming_best2 docstring for why
    it is not the default); pads to 256-tiles and falls back off-TPU."""
    platform = jax.devices()[0].platform
    Q, N = qdesc.shape[0], tdesc.shape[0]
    if platform == "tpu" and Q >= 256 and N >= 256:
        padq = (-Q) % 256
        padn = (-N) % 256
        if padq or padn:
            qdesc = jnp.pad(qdesc, ((0, padq), (0, 0)))
            quv = jnp.pad(quv, ((0, padq), (0, 0)))
            qrad = jnp.pad(qrad, ((0, padq),))
            qlvl = jnp.pad(qlvl, ((0, padq),))
            qvalid = jnp.pad(qvalid, ((0, padq),))
            tdesc = jnp.pad(tdesc, ((0, padn), (0, 0)))
            tuv = jnp.pad(tuv, ((0, padn), (0, 0)))
            tlvl = jnp.pad(tlvl, ((0, padn),))
            tvalid = jnp.pad(tvalid, ((0, padn),))
        bidx, best, second = masked_hamming_best2_tpu(
            qdesc, quv, qrad, qlvl, qvalid, tdesc, tuv, tlvl, tvalid,
            level_tol=level_tol,
        )
        return bidx[:Q], best[:Q], second[:Q]

    return _masked_hamming_best2_jnp(
        qdesc, quv, qrad, qlvl, qvalid, tdesc, tuv, tlvl, tvalid, level_tol
    )


def _masked_hamming_best2_jnp(
    qdesc, quv, qrad, qlvl, qvalid, tdesc, tuv, tlvl, tvalid, level_tol
):
    """jnp popcount reference path (CPU tests)."""
    from . import matching

    du = jnp.abs(quv[:, 0:1] - tuv[None, :, 0])
    dv = jnp.abs(quv[:, 1:2] - tuv[None, :, 1])
    mask = (
        (du <= qrad[:, None])
        & (dv <= qrad[:, None])
        & (jnp.abs(tlvl[None, :] - qlvl[:, None]) <= level_tol)
        & qvalid[:, None].astype(bool)
        & tvalid[None, :].astype(bool)
    )
    dist = matching.hamming_matrix(qdesc, tdesc)
    return matching.best_two(dist, mask)
