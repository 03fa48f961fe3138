"""Fused `striding` ConvSubsampling (x4) as one Pallas TPU kernel.

[Conv2d(1->C, k=3, s=2, p=1) -> ReLU -> Conv2d(C->C, k=3, s=2, p=1) -> ReLU
 -> flatten (F/4, C) -> Linear(F/4*C -> D)] — the whole pre-encode stack of
the Conformer (NeMo ConformerEncoder `pre_encode`, SURVEY.md N6;
models/conformer.ConvSubsampling is the XLA oracle it is parity-tested
against). The out-Linear BIAS is added by the caller.

Why: on v5e the XLA lowering of this chain is ~2.1 ms of a 10 ms B=32 x 15 s
inference step (conv2 1.23 ms at ~55% MXU, conv1 0.65 ms bandwidth-bound on
its (B, T/2, F/2, C) intermediate, the out-Linear 0.25 ms). The kernel keeps
the conv1 activation in VMEM and runs everything channels-on-sublanes so no
matmul pads its lane dimension beyond ~5%:

- The conv1 im2col (9 taps of the SINGLE-channel input — 9x the 80-wide
  mel grid, ~26 MB, trivially built by XLA) is pre-split OUTSIDE the kernel
  into SIX (t-parity x f-parity) phase arrays laid out
  (B, 9, f-slot, u-lane) — the odd-t phases twice, once u-shifted by +1 —
  so every stride-2 / halo access the two convs need becomes a CONTIGUOUS
  aligned slice.
- conv1 runs as six (C, 9) @ (9, NSLOT*TB) transposed matmuls (one per
  phase array; ~1.5x the minimal conv1 FLOPs, which are trivial), each
  masked once for the conv2 zero-pad positions.
- each conv2 tap is then a contiguous LANE slice of a conv1 result, copied
  to its sublane slab of the conv2 im2col buffer P2 (9C, N) in VMEM.
- conv2 is ONE (C, 9C) @ (9C, N) matmul per f-half: contraction
  9C=1584 pads lanes 1584->1664 (4%), N is a lane multiple, C rides
  sublanes unpadded.
- the out-Linear consumes the conv2 output straight from VMEM, accumulating
  the two statically-unrolled f-halves.

Zero-padding semantics of the reference convs are reproduced with column
masks on the conv1 OUTPUT (t1 < 0, t1 >= T1, f1 < 0): a zeroed conv1
*input* would otherwise leak ReLU(b1) into positions conv2 treats as its
zero pad. (f1 = F/2 is never touched: f1 = 2*f2 + df - 1 <= F/2 - 1.)

Output layout is (B, D, T2-padded) — transposed, channels on sublanes — and
the caller transposes the (small) result back. Backward: custom VJP that
recomputes through the XLA reference (`subsampling_reference`), so training
uses the fast forward and GSPMD-native gradients.

Scope: subsampling='striding', factor 4, symmetric padding
(causal_downsampling=False). Other configs keep the XLA path.

GSPMD: wrapped with the batch partition rule (parallel/kernel_sharding.py)
so the batch axis stays sharded under a mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_asr.parallel.kernel_sharding import batch_partitioned

TB = 128          # output frames (t2) per program
NSLOT = 21        # f-slot dim of a phase array (20 valid + 1 zero slot)
NF2 = 20          # conv2 output f dim (80 mels / 4)
HALF = 10         # f2 per statically-unrolled f-half


def _out_len(n: int) -> int:
    """k=3, s=2, p=1 conv output length (NeMo striding contract)."""
    return (n - 1) // 2 + 1


# Phase arrays, in kernel-operand order. tap (dt, df) of conv2 reads conv1
# output (t1, f1) = (2*t2 + dt - 1, 2*f2 + df - 1):
#   dt=0 -> t1 odd, u = t2 - 1  -> *S arrays (stored u-shifted by +1)
#   dt=1 -> t1 even, u = t2     -> E arrays
#   dt=2 -> t1 odd, u = t2      -> O arrays
#   df=0 -> f1 odd (fo), slot f2   | df=1 -> f1 even (fe), slot f2
#   df=2 -> f1 odd (fo), slot f2+1
# fe stores slots [f1=0,2,..,38, ZERO]; fo stores [ZERO, f1=1,3,..,39].
# Array index -> (pt, pf, delta): delta is the u carried by lane l of
# block p: u = p*TB + l + delta.
_ARRAYS = (
    (0, 0, 0),    # E fe   (dt=1, df=1)
    (0, 1, 0),    # E fo   (dt=1, df in {0,2})
    (1, 0, -1),   # S fe   (dt=0, df=1)
    (1, 1, -1),   # S fo   (dt=0, df in {0,2})
    (1, 0, 0),    # O fe   (dt=2, df=1)
    (1, 1, 0),    # O fo   (dt=2, df in {0,2})
)
# tap (dt, df) -> (array index, slot offset)
_TAPS = tuple(
    ({0: 2, 1: 0, 2: 4}[dt] + (0 if df == 1 else 1),
     0 if df <= 1 else 1)
    for dt in range(3) for df in range(3))


def _subsample_kernel(phs, w1t, b1, w2t, b2, wfct, out, p2,
                      *, c_ch, d_model, t1, kp, interpret=False):
    p = pl.program_id(1)
    n = HALF * TB
    f32 = jnp.float32
    # interpret mode runs on XLA:CPU, whose sharded executables lack
    # BF16xBF16=F32 dot thunks — keep the bf16 operand ROUNDING but run the
    # dots on f32-cast operands there (Mosaic-equivalent up to accumulation)
    ld = (lambda z: z.astype(f32)) if interpret else (lambda z: z)
    rnd = ((lambda z: z.astype(jnp.bfloat16).astype(f32)) if interpret
           else (lambda z: z.astype(jnp.bfloat16)))
    dn = (((1,), (0,)), ((), ()))
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, NSLOT * TB), 1) % TB

    # conv1 once per phase array, zero-pad-masked on its OUTPUT
    conv1 = []
    for ai, (pt, pf, delta) in enumerate(_ARRAYS):
        src = phs[ai][0].reshape(9, NSLOT * TB)
        r = jax.lax.dot_general(ld(w1t[:]), ld(src), dn,
                                preferred_element_type=f32)
        r = jnp.maximum(r + b1[:], 0.0)                  # (C, NSLOT*TB)
        u = p * TB + lane + delta
        u_hi = (t1 + (1 - pt)) // 2
        keep = (u >= 0) & (u < u_hi)
        conv1.append(jnp.where(keep, r, 0.0))

    acc = jnp.zeros((d_model, TB), f32)
    for h in range(2):
        for dt in range(3):
            for df in range(3):
                k = dt * 3 + df
                ai, s = _TAPS[k]
                lo = (s + h * HALF) * TB
                slab = conv1[ai][:, lo:lo + HALF * TB]   # contiguous lanes
                if df == 0 and h == 0:
                    # f1 = -1 (fo zero slot): conv2's f pad must see zero
                    fmask = jax.lax.broadcasted_iota(
                        jnp.int32, (1, HALF * TB), 1) >= TB
                    slab = jnp.where(fmask, slab, 0.0)
                p2[k * c_ch:(k + 1) * c_ch, :] = rnd(slab)
        o2 = jax.lax.dot_general(ld(w2t[:]), ld(p2[:]), dn,
                                 preferred_element_type=f32)
        o2 = jnp.maximum(o2 + b2[:], 0.0)                # (C, n)
        p3 = jnp.concatenate(
            [rnd(o2[:, f2 * TB:(f2 + 1) * TB]) for f2 in range(HALF)]
            + ([jnp.zeros((kp - HALF * c_ch, TB), p2.dtype)]
               if kp > HALF * c_ch else []), axis=0)     # (kp, TB)
        acc = acc + jax.lax.dot_general(
            ld(wfct[:, h * kp:(h + 1) * kp]), ld(p3), dn,
            preferred_element_type=f32)
    out[0] = acc.astype(out.dtype)


def _prep_phases(x, t1, ulanes):
    """x (B, T0, 80) -> 6 phase arrays (B, 9, NSLOT, ulanes) bf16 in
    `_ARRAYS` order (the odd-t phases stored twice, the first copy
    u-shifted by +1 for the dt=0 halo).

    Phase element (tap k=(kt,kf), slot sigma, lane l) must equal
    x[2*t1' + kt - 1, 2*f1' + kf - 1] at t1' = 2*(l + delta) + pt,
    f1' = 2*w + pf with w = sigma - pf (out-of-range -> zero; the kernel
    additionally masks t1' out of range and the fo zero slot). Instead of
    strided slicing + per-phase transposes (~2 ms of XLA relayouts at
    B=32 x 15 s), decompose both indices mod 4 after padding t and f by 5
    on the left: x0 = 4*(l + delta + 1 + ot//4 ... ) — concretely ONE
    (B, T/4, 4, F/4, 4) -> (B, 4, 4, F/4, T/4) master permute, after which
    every (phase, tap) slab is a contiguous slice."""
    b, t0, f = x.shape
    ul = ulanes
    xp = jnp.pad(x.astype(jnp.bfloat16),
                 ((0, 0), (5, 4 * (ul + 2) - 5 - t0), (5, 92 - 5 - f)))
    xr = xp.reshape(b, ul + 2, 4, 23, 4)
    m = xr.transpose(0, 2, 4, 3, 1)                  # (B, 4, 4, 23, UL+2)
    phases = []
    for pt, pf, delta in _ARRAYS:
        slabs = []
        for kt in range(3):
            for kf in range(3):
                ot = 2 * pt + kt                     # t0+5 = 4*(u+1) + ot
                of = 2 * pf + kf                     # f0+5 = 4*(w+1) + of
                i, at = ot % 4, ot // 4
                j, gt = of % 4, of // 4
                goff = (1 - pf) + gt                 # slot sigma -> w + 1
                aoff = delta + 1 + at                # lane l -> u + 1
                slabs.append(m[:, i, j, goff:goff + NSLOT, aoff:aoff + ul])
        phases.append(jnp.stack(slabs, axis=1))      # (B, 9, 21, UL)
    return phases


def _fwd_partitioned(c_ch: int, d_model: int, interpret: bool):
    """fun(x, w1, b1, w2, b2, wfc) -> (B, T2, D) bf16, batch-partitioned."""

    def fun(x, w1, b1, w2, b2, wfc):
        b, t0, f = x.shape
        assert f == 80, f
        t1 = _out_len(t0)
        t2 = _out_len(t1)
        n_t = -(-t2 // TB)
        ulanes = n_t * TB
        ph = _prep_phases(x, t1, ulanes)
        bf16 = jnp.bfloat16
        f32 = jnp.float32
        w1t = w1.reshape(9, c_ch).T.astype(bf16)             # (C, 9)
        w2t = w2.reshape(9 * c_ch, c_ch).T.astype(bf16)      # (C, 9C)
        # per-half K (=10C) padded to a lane multiple; the matching P3
        # rows are zeroed in-kernel
        kp = -(-HALF * c_ch // 128) * 128
        wfct = wfc.T.astype(bf16).reshape(d_model, 2, HALF * c_ch)
        wfct = jnp.pad(wfct, ((0, 0), (0, 0), (0, kp - HALF * c_ch)))
        wfct = wfct.reshape(d_model, 2 * kp)                 # (D, 2*kp)
        b1c = b1.reshape(c_ch, 1).astype(f32)
        b2c = b2.reshape(c_ch, 1).astype(f32)

        phase_spec = pl.BlockSpec((1, 9, NSLOT, TB),
                                  lambda bi, pi: (bi, 0, 0, pi),
                                  memory_space=pltpu.VMEM)
        const = lambda shape: pl.BlockSpec(
            shape, lambda bi, pi: (0,) * len(shape),
            memory_space=pltpu.VMEM)

        def kernel(*refs):
            _subsample_kernel(refs[:6], *refs[6:], c_ch=c_ch,
                              d_model=d_model, t1=t1, kp=kp,
                              interpret=interpret)

        outt = pl.pallas_call(
            kernel,
            grid=(b, n_t),
            in_specs=[phase_spec] * 6 + [
                const((c_ch, 9)), const((c_ch, 1)),
                const((c_ch, 9 * c_ch)), const((c_ch, 1)),
                const((d_model, 2 * kp))],
            out_specs=pl.BlockSpec((1, d_model, TB),
                                   lambda bi, pi: (bi, 0, pi),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, d_model, ulanes), bf16),
            scratch_shapes=[pltpu.VMEM((9 * c_ch, HALF * TB),
                                       f32 if interpret else bf16)],
            cost_estimate=pl.CostEstimate(
                flops=2 * b * t2 * NF2 * c_ch * (9 + 9 * c_ch + d_model),
                bytes_accessed=2 * b * 6 * 9 * NSLOT * ulanes
                + 2 * b * d_model * ulanes,
                transcendentals=0,
            ),
            interpret=interpret,
        )(*ph, w1t, b1c, w2t, b2c, wfct)
        return outt.transpose(0, 2, 1)[:, :t2, :]            # (B, T2, D)

    arg_specs = ((3, 0), (4, None), (1, None), (4, None), (1, None),
                 (2, None))
    out_specs = ((3, 0),)
    return batch_partitioned(fun, arg_specs, out_specs, tuple_out=False)


def subsampling_reference(x, w1, b1, w2, b2, wfc):
    """XLA oracle (and VJP recompute path): exactly the ConvSubsampling
    math in bf16 compute, minus the out-Linear bias.

    XLA:CPU's sharded executables cannot run BF16xBF16=F32 dot/conv thunks,
    so on CPU (tests only — the model's 'auto' backend never picks the
    kernel there) the bf16 operand rounding is emulated with f32 compute;
    results are identical up to the conv's internal f32 accumulation."""
    bf16 = jnp.bfloat16
    cdt = jnp.float32 if jax.default_backend() == "cpu" else bf16
    cast = lambda z: z.astype(bf16).astype(cdt)
    dn = jax.lax.conv_dimension_numbers(
        (1, 1, 1, 1), (3, 3, 1, 1), ("NHWC", "HWIO", "NHWC"))
    h = jax.lax.conv_general_dilated(
        cast(x[..., None]), cast(w1), (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=dn).astype(bf16)
    h = jnp.maximum(h + b1.astype(bf16), 0)
    h = jax.lax.conv_general_dilated(
        cast(h), cast(w2), (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=dn).astype(bf16)
    h = jnp.maximum(h + b2.astype(bf16), 0)
    b, t2, f2, c = h.shape
    return (cast(h.reshape(b, t2, f2 * c)) @ cast(wfc)).astype(bf16)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _core(x, w1, b1, w2, b2, wfc, c_ch, d_model, interpret):
    return _fwd_partitioned(c_ch, d_model, interpret)(x, w1, b1, w2, b2, wfc)


def _core_fwd(x, w1, b1, w2, b2, wfc, c_ch, d_model, interpret):
    out = _fwd_partitioned(c_ch, d_model, interpret)(x, w1, b1, w2, b2, wfc)
    return out, (x, w1, b1, w2, b2, wfc)


def _core_bwd(c_ch, d_model, interpret, res, g):
    _, vjp = jax.vjp(subsampling_reference, *res)
    return vjp(g)


_core.defvjp(_core_fwd, _core_bwd)


def fused_subsampling(
    x: jnp.ndarray,      # (B, T0, 80) waveform features (mel), any float
    w1: jnp.ndarray,     # (3, 3, 1, C) conv0 kernel (HWIO)
    b1: jnp.ndarray,     # (C,)
    w2: jnp.ndarray,     # (3, 3, C, C) conv1 kernel (HWIO)
    b2: jnp.ndarray,     # (C,)
    w_fc: jnp.ndarray,   # (F/4*C, D) out-Linear kernel, rows (f, c) f-major
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns (B, T2, D) bf16, WITHOUT the out-Linear bias (caller adds it,
    keeping its gradient on the plain-JAX side)."""
    c_ch = w1.shape[-1]
    d_model = w_fc.shape[-1]
    assert w2.shape == (3, 3, c_ch, c_ch), w2.shape
    assert w_fc.shape[0] == NF2 * c_ch, (w_fc.shape, c_ch)
    assert c_ch % 8 == 0, c_ch
    return _core(x, w1, b1, w2, b2, w_fc, c_ch, d_model, interpret)
