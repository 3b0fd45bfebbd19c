"""Golden check of the fused dense-radius KPConv Pallas kernel on TPU.

Compares ops/kpconv_pallas.py's Pallas branch (forward + custom-VJP
backward) against the pure-jnp reference at real NgeNet level shapes, and
times forward/forward+backward. Run on the TPU:

  PYTHONPATH=/root/repo:$PYTHONPATH python examples/kpconv_dense_tpu_check.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from pointcloudregistration_tpu.models.kpconv import kernel_points
from pointcloudregistration_tpu.ops import kpconv_pallas as kpp


def check(M, N, C, Cout, radius, tag, bf16=False):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.uniform(-0.5, 0.5, (M, 3)).astype(np.float32))
    s = jnp.asarray(rng.uniform(-0.5, 0.5, (N, 3)).astype(np.float32))
    feats = jnp.asarray(rng.normal(size=(N, C)).astype(np.float32))
    s_mask = jnp.asarray(rng.random(N) > 0.1)
    q_mask = jnp.asarray(rng.random(M) > 0.1)
    kp = jnp.asarray(kernel_points(15, radius))
    W = jnp.asarray(rng.normal(size=(15, C, Cout)).astype(np.float32)) * 0.1
    extent = radius * 0.8

    f_pal = jax.jit(lambda f, w: kpp._kpconv_dense_tpu(
        radius, extent, bf16, q, s, f, s_mask, q_mask, kp, w))
    f_ref = jax.jit(lambda f, w: kpp._ref_conv(
        q, s, f, s_mask, q_mask, kp, w, radius, extent))

    out_p = f_pal(feats, W)
    out_r = f_ref(feats, W)
    err = float(jnp.max(jnp.abs(out_p - out_r)))
    scale = float(jnp.max(jnp.abs(out_r))) + 1e-9

    # backward: d(sum(out^2))/d(feats, W)
    g_pal = jax.jit(jax.grad(lambda f, w: jnp.sum(f_pal(f, w) ** 2),
                             argnums=(0, 1)))
    g_ref = jax.jit(jax.grad(lambda f, w: jnp.sum(f_ref(f, w) ** 2),
                             argnums=(0, 1)))
    dfp, dwp = g_pal(feats, W)
    dfr, dwr = g_ref(feats, W)
    gerr = max(float(jnp.max(jnp.abs(dfp - dfr))) /
               (float(jnp.max(jnp.abs(dfr))) + 1e-9),
               float(jnp.max(jnp.abs(dwp - dwr))) /
               (float(jnp.max(jnp.abs(dwr))) + 1e-9))

    def timeit(fn, *args, iters=30):
        fn(*args)
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(*args)
        _ = float(jnp.sum(r[0] if isinstance(r, tuple) else r))  # readback
        return (time.perf_counter() - t0) / iters * 1e3

    t_fwd = timeit(f_pal, feats, W)
    t_ref = timeit(f_ref, feats, W)
    t_bwd = timeit(g_pal, feats, W)
    print(f"{tag} bf16={int(bf16)}: fwd rel err {err/scale:.2e}  "
          f"bwd rel err {gerr:.2e}  pallas {t_fwd:.3f} ms  "
          f"xla-ref {t_ref:.3f} ms  fwd+bwd {t_bwd:.3f} ms", flush=True)
    tol_f, tol_g = (3e-2, 6e-2) if bf16 else (2e-3, 5e-3)
    assert err / scale < tol_f, "forward mismatch"
    assert gerr < tol_g, "backward mismatch"


if __name__ == "__main__":
    print(jax.devices(), flush=True)
    # the four NgeNet encoder levels (MRI.yaml radii; 2048-pt clouds)
    for bf16 in (False, True):
        check(2048, 2048, 32, 32, 0.0625, "L0 resnet  ", bf16)
        check(2048, 2048, 1, 64, 0.0625, "L0 simple  ", bf16)
        check(1024, 2048, 128, 32, 0.125, "L0 strided ", bf16)
        check(1024, 1024, 64, 64, 0.125, "L1 resnet  ", bf16)
        check(512, 512, 128, 128, 0.25, "L2 resnet  ", bf16)
        check(256, 256, 256, 256, 0.5, "L3 resnet  ", bf16)
    print("ALL OK", flush=True)
