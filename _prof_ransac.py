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
rans = jax.jit(jax.vmap(lambda k, s_, t_, fs, ft, sm_, tm_: ransac_mod.ransac_feature_matching(
    k, s_, t_, fs, ft, threshold=cfg.ransac_thresh, num_hypotheses=cfg.ransac_hypotheses,
    mutual=cfg.mutual, src_mask=sm_, tgt_mask=tm_)))
out = rans(keys, s, t, f_src, f_tgt, sm, tm)
print("fitness:", [round(float(x),3) for x in out[2]["fitness"]])
float(jnp.sum(out[0]))
n=5; t0=time.perf_counter()
for _ in range(n):
    out = rans(keys, s, t, f_src, f_tgt, sm, tm)
    float(jnp.sum(out[0]))
dt=(time.perf_counter()-t0)/n
print(f"ransac: {dt*1e3:.1f} ms/batch ({dt/B*1e3:.2f} ms/pair)")
