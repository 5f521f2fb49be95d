"""Marginal cost of one (P, K) VPU pass inside a Pallas chunk loop, per op.

The composite kernels are VPU-pass-bound (~25-50 elementwise (P, K) passes
per 128-instance chunk — PROFILE.md roofline). Cutting passes needs to know
what each op class actually costs on this chip: a fused mul/add may be ~1
pass, exp/log1p may be 1 or ~8 depending on whether Mosaic lowers them to
the hardware transcendental unit, divide may be multi-pass, and bf16
arithmetic may or may not pack 2x. This kernel isolates exactly that: a
VMEM-resident chunk loop running R repetitions of one op class, timed
against the R=1 baseline — DMA and loop overhead cancel in the difference.

Usage: python -m scripts_dev.kernel_pass_micro [P] [K] [chunks]
"""
import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

P = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
K = int(sys.argv[2]) if len(sys.argv) > 2 else 128
CHUNKS = int(sys.argv[3]) if len(sys.argv) > 3 else 1024  # per grid step
GRID = 8


def _op_mul(x, y):
    return x * y


def _op_fma(x, y):
    return x * y + x


def _op_add(x, y):
    return x + y


def _op_div(x, y):
    return x / y


def _op_exp(x, y):
    return jnp.exp(x * 1e-3)  # keep finite


def _op_log1p(x, y):
    return jnp.log1p(jnp.minimum(jnp.abs(x) * 1e-3, 0.9))


def _op_where(x, y):
    return jnp.where(x > 0.0, x, y)


def _op_cmp_and(x, y):
    return ((x > 0.0) & (y > 0.0)).astype(jnp.float32)


def _op_min(x, y):
    return jnp.minimum(x, y)


def _op_bf16_mul(x, y):
    return (x.astype(jnp.bfloat16) * y.astype(jnp.bfloat16)
            ).astype(jnp.float32)


def _op_bf16_fma(x, y):
    a = x.astype(jnp.bfloat16)
    b = y.astype(jnp.bfloat16)
    return (a * b + a).astype(jnp.float32)


def _op_bf16_exp(x, y):
    return jnp.exp(x.astype(jnp.bfloat16) * jnp.bfloat16(1e-3)
                   ).astype(jnp.float32)


def _op_bf16_log1p(x, y):
    a = jnp.minimum(jnp.abs(x.astype(jnp.bfloat16)) * jnp.bfloat16(1e-3),
                    jnp.bfloat16(0.9))
    return jnp.log1p(a).astype(jnp.float32)


def _op_bf16_where(x, y):
    a = x.astype(jnp.bfloat16)
    b = y.astype(jnp.bfloat16)
    return jnp.where(a > 0, a, b).astype(jnp.float32)


def _op_exp2(x, y):
    return jnp.exp2(x * 1e-3)


def _op_fast_exp_raw(x, y):
    # Schraudolph: exp(v) ~ bitcast(i32(A*v + B)), A = 2^23/ln2,
    # B = 127*2^23 - C; ~2.9% max rel error. v kept in [-1, 0].
    v = -jnp.abs(x) * 1e-3
    z = v * jnp.float32(12102203.0) + jnp.float32(1064986316.0)
    return lax.bitcast_convert_type(z.astype(jnp.int32), jnp.float32)


def _op_fast_exp_poly(x, y):
    # floor-split exp2 with a degree-3 polynomial for 2^f (~2e-4 rel):
    # the "corrected" fast-exp candidate.
    v = -jnp.abs(x) * 1e-3
    z = v * jnp.float32(1.4426950408889634)
    zi = jnp.floor(z)
    f = z - zi
    # LSQ-relative degree-3 for 2^f on [0,1): max rel err 1.4e-4
    p = jnp.float32(0.0778232) * f + jnp.float32(0.22586806)
    p = p * f + jnp.float32(0.69617239)
    p = p * f + jnp.float32(0.99986365)
    e = lax.bitcast_convert_type(
        (zi.astype(jnp.int32) + 127) << 23, jnp.float32)
    return e * p


def _op_fast_log_raw(x, y):
    # bitcast log2: log(v) ~ (i32(v) - B)/A * ln2; ~3% abs error on the
    # mantissa-linear segment
    v = jnp.abs(x) + 0.5
    i = lax.bitcast_convert_type(v, jnp.int32).astype(jnp.float32)
    return (i - jnp.float32(1064986316.0)) * jnp.float32(5.727817e-8)


def _op_scan_f32(x, y):
    u = _triu(jnp.float32)
    return lax.dot_general(x, u, (((1,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32)


def _op_scan_bf16(x, y):
    u = _triu(jnp.bfloat16)
    return lax.dot_general(x.astype(jnp.bfloat16), u,
                           (((1,), (0,)), ((), ())),
                           precision=lax.Precision.DEFAULT,
                           preferred_element_type=jnp.float32)


def _triu(dt):
    i = lax.broadcasted_iota(jnp.int32, (K, K), 0)
    j = lax.broadcasted_iota(jnp.int32, (K, K), 1)
    return (i < j).astype(dt)


OPS = {
    "mul": _op_mul, "fma": _op_fma, "add": _op_add, "div": _op_div,
    "exp": _op_exp, "exp2": _op_exp2, "log1p": _op_log1p,
    "where": _op_where,
    "cmp_and": _op_cmp_and, "min": _op_min, "bf16_mul": _op_bf16_mul,
    "bf16_fma": _op_bf16_fma, "bf16_exp": _op_bf16_exp,
    "bf16_log1p": _op_bf16_log1p, "bf16_where": _op_bf16_where,
    "fast_exp_raw": _op_fast_exp_raw, "fast_exp_poly": _op_fast_exp_poly,
    "fast_log_raw": _op_fast_log_raw,
    "scan_matmul_f32": _op_scan_f32, "scan_matmul_bf16": _op_scan_bf16,
}


def make_kernel(op_name, reps):
    op = OPS[op_name]

    def kernel(x_ref, o_ref):
        def body(c, acc):
            base = x_ref[0:8, :]                     # (8, K) VMEM rows
            x = jnp.broadcast_to(base[0:1, :], (P, K)) + acc
            y = jnp.broadcast_to(base[1:2, :], (P, K))
            for _ in range(reps):
                x = op(x, y)
            return x * 1e-6

        acc = jnp.zeros((P, K), jnp.float32)
        acc = lax.fori_loop(0, CHUNKS, body, acc)
        o_ref[...] = acc[0:8, :]

    return kernel


def run(op_name, reps):
    x = jnp.ones((8, K), jnp.float32) * 0.5
    f = pl.pallas_call(
        make_kernel(op_name, reps),
        grid=(GRID,),
        in_specs=[pl.BlockSpec((8, K), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, K), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, K), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )
    fj = jax.jit(f)
    out = fj(x)
    np.asarray(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(4):
        out = fj(x)
    np.asarray(jnp.sum(out))
    return (time.perf_counter() - t0) / 4


def main():
    print(f"backend: {jax.default_backend()}  (P={P}, K={K}, "
          f"chunks={CHUNKS}x{GRID})", flush=True)
    total = GRID * CHUNKS
    for name in OPS:
        try:
            t1 = run(name, 1)
            t9 = run(name, 9)
        except Exception as e:
            print(f"{name:18s} FAILED: {str(e).splitlines()[0][:90]}",
                  flush=True)
            continue
        per_pass = (t9 - t1) / 8 / total
        print(f"{name:18s} base {t1*1e3:7.2f} ms  +8 reps {t9*1e3:7.2f} ms "
              f"-> {per_pass*1e9:7.1f} ns per (P,K) pass "
              f"({per_pass / (P * K) * 1e12:6.2f} ps/elem)", flush=True)


if __name__ == "__main__":
    main()
