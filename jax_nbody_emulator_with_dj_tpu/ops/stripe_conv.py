"""Pallas TPU kernel: strip-streamed fused 3x3x2 packed convolution.

This is the production conv kernel for the packed (space-to-depth) interior
(``ops/s2d.py``): a VALID 3x3x3 conv on (B, D, H, W, 64) activations executed
as a 3x3x2 conv on packed (B, D, H, W/2, 128) tensors.  XLA's conv emitter
reaches ~67 TF/s on that form on a v5e (34% of the 197 TF/s bf16 peak); this
kernel removes the remaining overheads structurally:

  * **Global row linearization.**  The padded input is reshaped ONCE in XLA
    (free for an HBM array) to a 2D row view ``x2d[(d*Hp + h)*Wp + w] =
    x[d, h, w]``.  A conv tap ``(kd, kh, ka)`` is then a CONSTANT row offset
    ``kd*Hp*Wp + kh*Wp + ka``, and, because each kernel block covers FULL
    W rows of one (d, h-strip), every tap's LHS is one contiguous,
    lane-aligned row range: one MXU matmul per tap, zero gather/relayout.
  * **Plane-ring reuse.**  The grid iterates (h-strip, d) with d innermost.
    VMEM holds a 4-slot ring of per-plane h-strips; each step DMAs exactly
    ONE new plane strip (async, double-buffered against compute) and reuses
    the other two from previous steps — input bytes/output voxel ~ 1.0
    (the old window kernel re-read the D-halo 5/3 times, synchronously).
  * **Aligned W-parity shift.**  The packed conv's ka=1 taps need a +1 row
    offset (sublane-misaligned); a single one-row-shifted copy per strip
    (amortized over the 3 output planes and 9 taps that read it) realigns
    them.  This is the only data movement the kernel adds.
  * **Useful-FLOPs-only matmuls.**  Output rows are computed on the full
    W pitch, so the only garbage columns are the last W cell (VALID-conv
    drop) and the W pad — <2% at production widths (the window kernel
    computed up to 2x garbage halo rows).
  * **Fused epilogue.**  fp32 accumulation + bias + LeakyReLU in registers,
    bf16 write directly into the (Pallas-pipelined) output block.

The kernel also takes N **input parts**: a conv over an implicit channel
concatenation of several packed tensors (the velocity path's fused tangent
conv and the decoder's skip-concat blocks) accumulates taps from each part
without ever materializing the concatenated tensor.

Reference semantics: ``/root/reference/src/jax_nbody_emulator/layers.py:52-60``
(VALID conv3) + ``:127-133`` (LeakyReLU 0.01); the packed-domain equivalence
is the W-parity decomposition in ``ops/s2d.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NSLOT = 4  # plane-strip ring slots (3 live + 1 incoming)


def _ceil_to(v, m):
    return (v + m - 1) // m * m


def _kernel(
    *refs,
    n_in: int,
    leaky: bool,
    BH: int,
    chunk: int,
    Wpp: int,
    Hp: int,
    OD: int,
    SR: int,
    cins,
    acc_split: int = 2,
):
    # refs: x2d_0..x2d_{n-1}, w, b, out, strips_0.., rots_0.., sems
    xs = refs[:n_in]
    w_ref = refs[n_in]
    b_ref = refs[n_in + 1]
    out_ref = refs[n_in + 2]
    strips = refs[n_in + 3 : 2 * n_in + 3]
    rots = refs[2 * n_in + 3 : 3 * n_in + 3]
    sems = refs[3 * n_in + 3]

    hblk = pl.program_id(0)
    d = pl.program_id(1)
    h0 = hblk * BH
    SROWS = (BH + 2) * Wpp
    M = BH * Wpp
    CHUNK = chunk

    def dma(plane, slot, i):
        return pltpu.make_async_copy(
            xs[i].at[pl.ds((plane * Hp + h0) * Wpp, SROWS)],
            strips[i].at[slot, pl.ds(0, SROWS)],
            sems.at[slot, i],
        )

    def build_rot(slot):
        for i in range(n_in):
            rots[i][slot, 0 : SR - 1, :] = strips[i][slot, pl.ds(1, SR - 1), :]

    @pl.when(d == 0)
    def _():
        # h-strip prologue: planes 0 and 1 (plane 2 is handled by the
        # steady-state wait below).
        for p in range(2):
            for i in range(n_in):
                dma(p, p % NSLOT, i).start()
        for i in range(n_in):
            dma(2, 2 % NSLOT, i).start()
        for p in range(2):
            for i in range(n_in):
                dma(p, p % NSLOT, i).wait()
            build_rot(p % NSLOT)

    s2 = jax.lax.rem(d + 2, NSLOT)
    for i in range(n_in):
        dma(d + 2, s2, i).wait()
    build_rot(s2)

    @pl.when(d + 3 < OD + 2)
    def _():
        s3 = jax.lax.rem(d + 3, NSLOT)
        for i in range(n_in):
            dma(d + 3, s3, i).start()

    bias = b_ref[0].astype(jnp.float32)
    slots = [jax.lax.rem(d + kd, NSLOT) for kd in range(3)]

    def chunk_body(ci, _):
        m0 = pl.multiple_of(ci * CHUNK, CHUNK)
        # Independent accumulation chains: a single chained accumulator
        # serializes all 18 tap matmuls behind each other's VPU add; a few
        # parallel chains expose ILP to the MXU/VPU pipeline.
        accs = [
            jnp.broadcast_to(bias[None, :], (CHUNK, bias.shape[0]))
        ] + [jnp.zeros((CHUNK, bias.shape[0]), jnp.float32) for _ in range(acc_split - 1)]
        t = 0
        for kd in range(3):
            slot = slots[kd]
            for kh in range(3):
                off = kh * Wpp + m0
                for ka in range(2):
                    for i in range(n_in):
                        src = strips[i] if ka == 0 else rots[i]
                        accs[t % acc_split] = accs[t % acc_split] + jax.lax.dot_general(
                            src[slot, pl.ds(off, CHUNK), :],
                            w_ref[kd, kh, ka, pl.ds(sum(cins[:i]), cins[i]), :],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                        t += 1
        acc = accs[0]
        for extra in accs[1:]:
            acc = acc + extra
        if leaky:
            acc = jnp.where(acc > 0, acc, 0.01 * acc)
        out_ref[pl.ds(m0, CHUNK), :] = acc.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, M // CHUNK, chunk_body, 0)


def _pick_chunk(m: int, target: int = 256):
    """Largest 8-aligned divisor of ``m`` not exceeding ``target`` rows."""
    best = 8
    for c in range(8, target + 1, 8):
        if m % c == 0:
            best = c
    return best


def _pick_geometry(wpp: int, cins, co: int, itemsize: int = 2):
    """Pick the h-strip height BH to fit the VMEM budget.

    VMEM per input part: 2 * NSLOT * SR * cin * 2B (strips + rots); plus
    weights 18 * sum(cin) * co * 2B, plus 2 output blocks (Pallas double
    buffers out windows) BH * wpp * co * 2B, plus the fp32 accumulator.
    """
    budget = 13 * 1024 * 1024
    total_cin = sum(cins)
    w_bytes = 18 * total_cin * co * itemsize
    for bh in (16, 12, 8, 6, 4, 2):
        sr = _ceil_to((bh + 2) * wpp + 8, 8)
        strip_bytes = 2 * NSLOT * sr * total_cin * itemsize
        out_bytes = 2 * bh * wpp * co * itemsize
        acc_bytes = _pick_chunk(bh * wpp) * co * 4
        if w_bytes + strip_bytes + out_bytes + acc_bytes <= budget:
            return bh
    return 2


@functools.partial(
    jax.jit,
    static_argnames=("leaky", "block_h", "interpret", "out_dtype", "acc_split"),
)
def conv3_packed_stripe(
    xps,
    wp,
    bias=None,
    *,
    leaky: bool = False,
    block_h: int | None = None,
    interpret: bool = False,
    out_dtype=None,
    acc_split: int = 2,
):
    """Fused packed VALID conv (+bias +LeakyReLU) over concatenated parts.

    Args:
        xps: one packed tensor ``(B, D, H, WP, C)`` or a tuple of several
            sharing (B, D, H, WP) — the conv input is their implicit
            channel concatenation.
        wp: packed kernel ``(3, 3, 2, sum(C_i), Co)`` (``s2d.pack_w3`` with
            matching group layout).
        bias: ``(Co,)`` fp32 packed bias (``s2d.pack_bias``) or None.
        leaky: fuse LeakyReLU(0.01).

    Returns:
        ``(B, D-2, H-2, WP-1, Co)``.
    """
    if not isinstance(xps, (tuple, list)):
        xps = (xps,)
    xps = tuple(xps)
    n_in = len(xps)
    b, d, h, wpdim, _ = xps[0].shape
    cins = tuple(int(x.shape[-1]) for x in xps)
    co = int(wp.shape[-1])
    assert wp.shape[:3] == (3, 3, 2) and int(wp.shape[3]) == sum(cins)
    dtype = xps[0].dtype
    wp = wp.astype(dtype)

    od, oh, owp = d - 2, h - 2, wpdim - 1
    wpp = _ceil_to(wpdim, 8)
    bh = block_h if block_h else _pick_geometry(wpp, cins, co)
    chunk = _pick_chunk(bh * wpp)
    ohp = _ceil_to(oh, bh)
    hp = ohp + 2
    nh = ohp // bh

    M = bh * wpp
    SROWS = (bh + 2) * wpp
    SR = _ceil_to(SROWS + 8, 8)

    bvec = (
        jnp.zeros((1, co), jnp.float32)
        if bias is None
        else bias.astype(jnp.float32).reshape(1, co)
    )

    # Pad each part to (B, D, Hp, Wpp, C) and linearize to global rows.  The
    # reshape of an HBM array is free; the pads cost one fused copy (a no-op
    # when the geometry is already aligned, which the runtime arranges).
    def prep(x):
        return jnp.pad(
            x.astype(dtype),
            ((0, 0), (0, 0), (0, hp - h), (0, wpp - wpdim), (0, 0)),
        )

    grid = (nh, od)
    kern = functools.partial(
        _kernel,
        n_in=n_in,
        leaky=leaky,
        BH=bh,
        chunk=chunk,
        Wpp=wpp,
        Hp=hp,
        OD=od,
        SR=SR,
        cins=cins,
        acc_split=acc_split,
    )

    call = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_in
        + [
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (M, co), lambda i, j: (j * nh + i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(
            (od * nh * M, co), out_dtype or dtype
        ),
        scratch_shapes=[pltpu.VMEM((NSLOT, SR, c), dtype) for c in cins]
        + [pltpu.VMEM((NSLOT, SR, c), dtype) for c in cins]
        + [pltpu.SemaphoreType.DMA((NSLOT, n_in))],
        cost_estimate=pl.CostEstimate(
            flops=2 * od * ohp * wpp * 18 * sum(cins) * co,
            bytes_accessed=sum(
                d * hp * wpp * c * 2 for c in cins
            )
            + od * ohp * wpp * co * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )

    def one(args):
        x2ds = [a.reshape(d * hp * wpp, c) for a, c in zip(args, cins)]
        y = call(*x2ds, wp, bvec)
        y = y.reshape(od, ohp, wpp, co)
        return y[:, :oh, :owp, :]

    padded = [prep(x) for x in xps]
    ys = [one([p[n] for p in padded])[None] for n in range(b)]
    return ys[0] if b == 1 else jnp.concatenate(ys, axis=0)
