"""Direct (MXU) vs partitioned-FFT convolution crossover sweep.

Per-block streaming cost at block=128, ch=2, for growing IR lengths,
single-instance and batch=256 (vmapped).  Sets
``ops.direct_conv.DIRECT_CONV_MAX_TAPS`` — measured numbers in
docs/PERF.md (v5e, round 2).  Run on the attached accelerator:

    python benchmarks/conv_crossover.py
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np, jax, jax.numpy as jnp
from firewheel_tpu.ops.direct_conv import direct_conv_step, direct_hist_init
from firewheel_tpu.ops.fft_conv import conv_partition_ir, conv_state_init, conv_step

print("device:", jax.devices()[0], flush=True)
F, CH = 128, 2
rng = np.random.default_rng(0)

def timeit(fn, state, iters=200):
    x = jnp.asarray(rng.standard_normal((CH, F)).astype(np.float32))
    y, state = fn(x, state)  # compile
    jax.block_until_ready(y)
    t0 = time.time()
    for _ in range(iters):
        y, state = fn(x, state)
    jax.block_until_ready(y)
    return (time.time() - t0) / iters * 1e6  # us/block

def timeit_b(fn, state, B, iters=50):
    xb = jnp.asarray(rng.standard_normal((B, CH, F)).astype(np.float32))
    vf = jax.jit(jax.vmap(fn))
    y, state = vf(xb, state)
    jax.block_until_ready(y)
    t0 = time.time()
    for _ in range(iters):
        y, state = vf(xb, state)
    jax.block_until_ready(y)
    return (time.time() - t0) / iters * 1e6

for taps in [128, 256, 512, 1024, 2048, 4096, 8192, 16384, 32768]:
    ir = (rng.standard_normal((1, taps)) * 0.1).astype(np.float32)
    tj = jnp.asarray(ir)
    P = taps // F
    hh, Ht = conv_partition_ir(ir, F)
    hh, Ht = jnp.asarray(hh), jnp.asarray(Ht)

    d_fn = jax.jit(lambda x, h: direct_conv_step(x, h, tj))
    f_fn = jax.jit(lambda x, s: conv_step(x, s, hh, Ht))
    us_d = timeit(d_fn, jnp.asarray(direct_hist_init(CH, taps)))
    us_f = timeit(f_fn, jax.tree.map(jnp.asarray, conv_state_init(P, CH, F)))

    B = 256
    d_fnb = lambda x, h: direct_conv_step(x, h, tj)
    f_fnb = lambda x, s: conv_step(x, s, hh, Ht)
    hb = jnp.zeros((B, CH, taps - 1), jnp.float32)
    sb = jax.tree.map(lambda a: jnp.broadcast_to(jnp.asarray(a), (B,) + np.shape(a)).copy() if np.shape(a) else jnp.zeros((B,), jnp.asarray(a).dtype), conv_state_init(P, CH, F))
    us_db = timeit_b(d_fnb, hb, B)
    us_fb = timeit_b(f_fnb, sb, B)
    print(f"taps={taps:6d}: single direct {us_d:8.1f}us  fft {us_f:8.1f}us | "
          f"B=256 direct {us_db:9.1f}us  fft {us_fb:9.1f}us", flush=True)
print("XOVER_DONE", flush=True)
