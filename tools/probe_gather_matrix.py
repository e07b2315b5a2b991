"""On-chip probe matrix for in-Pallas `take_along_axis` (tpu.dynamic_gather).

This Mosaic version lowers lax.gather inside Pallas only when the indices
broadcast to the table's full 2D shape (lowering.py:2481-2524). What the
*compiler backend* then accepts (dtypes, lane widths, gather dim) is not
documented — this probe maps the supported envelope empirically so the gated
kernels (pallas_{update3d,clfm,corr3d,gather}.py) can be reworked to fit it.

Each case compiles a tiny one-gather kernel on the real chip and checks
values against numpy. Prints one PASS/FAIL line per case; always exits 0
(the matrix is diagnostic, not a gate).
"""
import sys
import traceback

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

rng = np.random.RandomState(0)
print("devices:", jax.devices(), flush=True)


def probe_dim0(name, n, c, dtype, cast_f32=False):
    """out[i, :] = table[idx[i], :] — row gather along sublanes."""

    def kernel(t_ref, i_ref, o_ref):
        table = t_ref[...]
        if cast_f32:
            table = table.astype(jnp.float32)
        col = jnp.broadcast_to(i_ref[:, 0][:, None], table.shape)
        g = jnp.take_along_axis(table, col, axis=0)
        o_ref[...] = g.astype(o_ref.dtype)

    table = rng.randn(n, c).astype(np.float32)
    if dtype == jnp.int8:
        table = np.clip(table * 64, -127, 127).astype(np.int8)
    elif dtype == jnp.int32:
        table = (table * 64).astype(np.int32)
    else:
        table = table.astype(dtype)
    idx = rng.randint(0, n, size=(n, 1)).astype(np.int32)
    out_dtype = jnp.float32 if cast_f32 else dtype
    run(name, kernel, [table, idx],
        jax.ShapeDtypeStruct((n, c), out_dtype),
        np.asarray(table[idx[:, 0]], np.float32))


def probe_dim1(name, r, m, dtype):
    """out[:, j] = table[:, idx[j]] — lane gather (dims=[1])."""

    def kernel(t_ref, i_ref, o_ref):
        table = t_ref[...]
        col = jnp.broadcast_to(i_ref[0, :][None, :], table.shape)
        o_ref[...] = jnp.take_along_axis(table, col, axis=1)

    table = rng.randn(r, m).astype(dtype)
    idx = rng.randint(0, m, size=(1, m)).astype(np.int32)
    run(name, kernel, [table, idx],
        jax.ShapeDtypeStruct((r, m), dtype),
        np.asarray(table[:, idx[0]], np.float32))


def probe_bf16_packed(name, n, c):
    """bf16 table packed as i32 pairs: gather rows of the [N, C//2] i32 view,
    then bitcast back — dodges the 16-bit dynamic_gather restriction."""

    def kernel(t_ref, i_ref, o_ref):
        packed = t_ref[...]  # [N, C//2] i32
        col = jnp.broadcast_to(i_ref[:, 0][:, None], packed.shape)
        g = jnp.take_along_axis(packed, col, axis=0)
        pairs = jax.lax.bitcast_convert_type(g, jnp.bfloat16)  # [N, C//2, 2]
        o_ref[...] = pairs.reshape(packed.shape[0], -1)

    table = rng.randn(n, c).astype(jnp.bfloat16)
    packed = np.asarray(table).view(np.int32) if False else None
    tb = np.asarray(table)
    packed = tb.view(np.uint16).astype(np.uint32)
    packed = (packed[:, 0::2] | (packed[:, 1::2] << 16)).astype(np.int32)
    idx = rng.randint(0, n, size=(n, 1)).astype(np.int32)
    run(name, kernel, [packed, idx],
        jax.ShapeDtypeStruct((n, c), jnp.bfloat16),
        np.asarray(tb[idx[:, 0]], np.float32))


def run(name, kernel, args, out_shape, want):
    try:
        got = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(*[jnp.asarray(a) for a in args])
        d = np.max(np.abs(np.asarray(got, np.float32) - want))
        print(f"{'PASS' if d == 0 else 'WRONG'} {name}: max|d|={d:.3e}",
              flush=True)
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"FAIL {name}: {type(e).__name__}: {msg}", flush=True)
        if "-v" in sys.argv:
            traceback.print_exc()


if __name__ == "__main__":
    probe_dim0("f32 [1024,128] dim0", 1024, 128, jnp.float32)
    probe_dim0("f32 [8192,128] dim0", 8192, 128, jnp.float32)
    probe_dim0("i32 [1024,128] dim0", 1024, 128, jnp.int32)
    probe_dim0("bf16 [1024,128] dim0", 1024, 128, jnp.bfloat16)
    probe_dim0("bf16->f32-cast [1024,128] dim0", 1024, 128, jnp.bfloat16,
               cast_f32=True)
    probe_dim0("int8 [1024,128] dim0", 1024, 128, jnp.int8)
    probe_dim0("f32 [1024,8] dim0 (narrow)", 1024, 8, jnp.float32)
    probe_dim0("f32 [1024,3] dim0 (xyz)", 1024, 3, jnp.float32)
    probe_dim0("f32 [4096,3] dim0 (xyz big)", 4096, 3, jnp.float32)
    probe_dim1("f32 [8,1024] dim1 (lane)", 8, 1024, jnp.float32)
    probe_dim1("f32 [128,128] dim1 (lane)", 128, 128, jnp.float32)
    probe_bf16_packed("bf16-as-i32-packed [1024,128] dim0", 1024, 128)
