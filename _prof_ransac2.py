import time, jax, jax.numpy as jnp
from pointcloudregistration_tpu.data import synthetic
from pointcloudregistration_tpu.pipelines import c2p
from pointcloudregistration_tpu.ops import ransac as ransac_mod
cfg = c2p.C2PConfig()
B, N = 16, 3000
data = synthetic.make_batch(jax.random.PRNGKey(0), B, n_points=N, max_angle_deg=45.0, max_trans=0.5, deform_amp=0.05)
s, t, sm, tm = data["source"], data["target"], data["source_mask"], data["target_mask"]
keys = jax.random.split(jax.random.PRNGKey(1), B)
feat = jax.jit(jax.vmap(lambda p, m: c2p._features(p, m, cfg)))
f_src = feat(s, sm); f_tgt = feat(t, tm)

match = jax.jit(jax.vmap(lambda fs, ft, sm_, tm_: ransac_mod.match_features(fs, ft, True, sm_, tm_)))
idx, valid = match(f_src, f_tgt, sm, tm)
tgt_corr = jax.jit(jax.vmap(lambda t_, i: jnp.take_along_axis(t_, i[..., None], axis=-2)))(t, idx)
rc = jax.jit(jax.vmap(lambda k, s_, tc, v: ransac_mod.ransac_correspondences(
    k, s_, tc, cfg.ransac_thresh, cfg.ransac_hypotheses, 3, corr_mask=v)))
out = rc(keys, s, tgt_corr, valid)

def bench(name, fn, *a):
    o = fn(*a); float(jnp.sum(jax.tree_util.tree_leaves(o)[0].astype(jnp.float32)))
    n=5; t0=time.perf_counter()
    for _ in range(n):
        o = fn(*a); float(jnp.sum(jax.tree_util.tree_leaves(o)[0].astype(jnp.float32)))
    print(f"{name}: {(time.perf_counter()-t0)/n*1e3:.1f} ms/batch")
bench("match_features(mutual)", match, f_src, f_tgt, sm, tm)
bench("ransac_correspondences", rc, keys, s, tgt_corr, valid)
