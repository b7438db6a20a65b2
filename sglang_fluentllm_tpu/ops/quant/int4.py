"""W4A16 weight-only INT4 quantization (GPTQ-class) + Pallas dequant GEMM.

Analog of the reference's weight-only int4 stack
(``layers/quantization/compressed_tensors/`` pack-quantized w4a16 /
``gptq.py`` / ``awq.py`` configs): weights store 4 bits/element with
per-(128-row group x output channel) scales — the largest remaining
decode-bandwidth lever on TPU (weights stream at 1/4 the bf16 bytes;
decode is weight-bandwidth-bound).

TPU-native layout: two int4 values pack into one int8 byte along K, split
PER 128-row GROUP — group ``g`` (original rows ``[128g, 128g+128)``) packs
its first 64 rows into the LOW nibbles and its last 64 rows into the HIGH
nibbles of packed rows ``[64g, 64g+64)``. A kernel k-block is therefore
one [64, N_blk] int8 DMA whose unpack is two static slices concatenated —
no sublane interleave on the VPU.

Compute paths:
- jnp reference: unpack + dequant + matmul (CPU tests, odd shapes);
- Pallas ``int4_matmul_kernel``: per k-group, unpack nibbles (i32
  shifts), cast to bf16, MXU dot, scale in the f32 accumulation epilogue
  — HBM sees only the packed bytes.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 128      # K rows per scale group
HALF = GROUP // 2


@dataclasses.dataclass
class QuantizedWeightInt4:
    """Nibble-packed int4 weight with per-group per-channel scales."""

    w4: jax.Array      # [..., K//2, N] int8 (group-split nibble packing)
    scale: jax.Array   # [..., K//GROUP, N] float32
    k: int             # original K (static; stored padded to GROUP)


# ``k`` is static metadata (shape info) so jit specializes on it
jax.tree_util.register_dataclass(
    QuantizedWeightInt4, data_fields=["w4", "scale"], meta_fields=["k"],
)


def quantize_weight_int4(w: np.ndarray,
                         group: int = GROUP) -> QuantizedWeightInt4:
    """Symmetric per-(group x output-channel) int4 quantization."""
    w = np.asarray(w, np.float32)
    *lead, K, N = w.shape
    Kp = -(-K // group) * group
    wp = np.zeros((*lead, Kp, N), np.float32)
    wp[..., :K, :] = w
    g = wp.reshape(*lead, Kp // group, group, N)
    amax = np.abs(g).max(axis=-2, keepdims=True)          # [..., G, 1, N]
    scale = np.maximum(amax / 7.0, 1e-12)
    q = np.clip(np.rint(g / scale), -8, 7).astype(np.int8)
    # group-split nibble packing: low = rows [0, 64), high = rows [64, 128)
    lo = q[..., :HALF, :]
    hi = q[..., HALF:, :]
    packed = ((hi.astype(np.uint8) << 4)
              | (lo.astype(np.uint8) & 0x0F)).astype(np.int8)
    packed = packed.reshape(*lead, Kp // 2, N)
    return QuantizedWeightInt4(
        w4=jnp.asarray(packed),
        scale=jnp.asarray(scale.squeeze(-2).astype(np.float32)),
        k=K,
    )


def _unpack_nibbles(packed: jax.Array) -> jax.Array:
    """[..., P, N] int8 -> [..., 2P, N] int8 in original row order
    (low-nibble half first — the group-split layout's contract)."""
    b = packed.astype(jnp.int32)
    lo = jnp.left_shift(b, 28) >> 28          # sign-extend low nibble
    hi = jnp.left_shift(b, 24) >> 28          # sign-extend high nibble
    return jnp.concatenate([lo, hi], axis=-2).astype(jnp.int8)


def dequantize_int4(qw: QuantizedWeightInt4) -> jax.Array:
    """jnp reference dequant to f32 [..., K, N]."""
    *lead, P2, N = qw.w4.shape
    Kp = P2 * 2
    G = Kp // GROUP
    g = qw.w4.reshape(*lead, G, HALF, N)
    q = _unpack_nibbles(g)                                # [..., G, 128, N]
    w = q.astype(jnp.float32) * qw.scale[..., :, None, :]
    return w.reshape(*lead, Kp, N)[..., :qw.k, :]


def int4_matmul_ref(x: jax.Array, qw: QuantizedWeightInt4) -> jax.Array:
    return (x @ dequantize_int4(qw).astype(x.dtype)).astype(x.dtype)


# ----------------------------------------------------------------------
# Pallas dequant GEMM: stream packed bytes, unpack + dequant in VMEM
# ----------------------------------------------------------------------

def _int4_mm_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *,
                    n_steps: int, kblk: int):
    """One grid step processes ``kblk`` quant groups.

    Measured round 5 (tools/bench_int4_gemm.py): the first-cut kernel
    (one group/step, in-kernel jnp.concatenate of the lo/hi nibble
    halves, 256-wide N blocks) ran 0.78x of bf16 — dominated by the
    concat relayout and tiny per-step DMAs. This version: (a) split-dot
    — lo/hi halves multiply their own x column slices, no relayout;
    (b) kblk groups per step -> 4x larger weight DMAs and fewer grid
    steps; (c) scale rows come from the full strip (Mosaic forbids
    (1, N) blocks)."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    for i in range(kblk):
        b = w_ref[i * HALF:(i + 1) * HALF, :].astype(jnp.int32)
        lo = (jnp.left_shift(b, 28) >> 28).astype(jnp.bfloat16)
        hi = (jnp.left_shift(b, 24) >> 28).astype(jnp.bfloat16)
        x = x_ref[:, i * GROUP:(i + 1) * GROUP].astype(jnp.bfloat16)
        part = jax.lax.dot_general(
            x[:, :HALF], lo, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            x[:, HALF:], hi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[:] += part * s_ref[k * kblk + i]

    @pl.when(k == n_steps - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n"))
def int4_block_matmul(
    x: jax.Array,          # [M, K] bf16/f32 (K multiple of GROUP)
    w4: jax.Array,         # [K//2, N] int8 packed
    scale: jax.Array,      # [K//GROUP, N] f32
    block_m: int = 0,      # 0 = auto (M rounded to 8, capped at 128 —
                           # padding decode-sized M up to 128 wastes MXU)
    block_n: int = 0,      # 0 = auto (512 when N allows)
) -> jax.Array:
    M, K = x.shape
    N = w4.shape[1]
    if block_m <= 0:
        block_m = min(128, -(-M // 8) * 8)
    if block_n <= 0:
        block_n = 512 if N % 512 == 0 else 256
    assert K % GROUP == 0 and N % block_n == 0
    Mp = -(-M // block_m) * block_m
    if Mp != M:
        x = jnp.pad(x, ((0, Mp - M), (0, 0)))
    n_groups = K // GROUP
    kblk = next(b for b in (8, 4, 2, 1) if n_groups % b == 0)
    n_steps = n_groups // kblk
    grid = (Mp // block_m, N // block_n, n_steps)
    out = pl.pallas_call(
        functools.partial(_int4_mm_kernel, n_steps=n_steps, kblk=kblk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, kblk * GROUP), lambda m, n, k: (m, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kblk * HALF, block_n), lambda m, n, k: (k, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_groups, block_n), lambda m, n, k: (0, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_m, block_n), lambda m, n, k: (m, n),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((Mp, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * N * K,
            bytes_accessed=Mp * K * 2 + K * N // 2 + Mp * N * 2,
            transcendentals=0,
        ),
    )(x, w4, scale)
    return out[:M]


def _kernel_ok(qw: QuantizedWeightInt4) -> bool:
    return (qw.w4.ndim == 2 and qw.w4.shape[-1] % 256 == 0
            and (qw.w4.shape[-2] * 2) % GROUP == 0)


def int4_matmul(x: jax.Array, qw: QuantizedWeightInt4) -> jax.Array:
    """Dispatch: Pallas dequant GEMM on TPU for aligned 2D weights, jnp
    reference otherwise (CPU tests, stacked-layer leading dims)."""
    if jax.default_backend() == "tpu" and _kernel_ok(qw):
        lead = x.shape[:-1]
        K = x.shape[-1]
        Kp = qw.w4.shape[-2] * 2
        x2 = x.reshape(-1, K)
        if Kp != K:
            x2 = jnp.pad(x2, ((0, 0), (0, Kp - K)))
        M = x2.shape[0]
        block_m = 128 if M >= 128 else max(16, 1 << (M - 1).bit_length())
        out = int4_block_matmul(x2, qw.w4, qw.scale, block_m=block_m)
        return out.reshape(*lead, qw.w4.shape[-1])
    return int4_matmul_ref(x, qw)
