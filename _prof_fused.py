import time, jax, numpy as np, functools
import jax.numpy as jnp
from svgrasterize_tpu import scene_from_filepath
from svgrasterize_tpu.core.transform import Transform
import svgrasterize_tpu.render_plan as rp
import svgrasterize_tpu.ops.fused_exec as fe

scene, ids, size = scene_from_filepath("/root/reference/demo/material-design.svg")
L = rp.lower_scene(scene, Transform().matrix(0,1,0,1,0,0), (0,0,1488,1488), False)
nt = L.grid[0]*L.grid[1]
feats = fe.plan_features(L.items, L.bigs, L.clips, None, None, L.tile)
ij = {k: jnp.asarray(v) for k,v in L.items.items() if not k.startswith("_")}
jb = tuple(jnp.asarray(b) for b in L.bigs)
jc = jnp.asarray(L.clips)

def bench(name, body):
    @jax.jit
    def run_k(ij, jb, jc, k):
        def f(_i, carry):
            itm = dict(ij); itm["opacity"] = ij["opacity"] + carry * 0.0
            return body(itm, jb, jc)
        return jax.lax.fori_loop(0, k, f, jnp.float32(0))
    float(run_k(ij, jb, jc, 2)); float(run_k(ij, jb, jc, 12))
    reps=[]
    for _ in range(3):
        t0=time.time(); float(run_k(ij, jb, jc, 2)); a=time.time()-t0
        t0=time.time(); float(run_k(ij, jb, jc, 12)); b=time.time()-t0
        reps.append((b-a)/10*1e3)
    print(f"{name}: {min(reps):.2f} ms", flush=True)

def full(itm, jb, jc):
    out = fe.execute_items_fused(itm, L.tile, nt, jb, None, None, jc, feats)
    return out[0,0,0,0]
def prep_only(itm, jb, jc):
    e, p, _ = fe._edge_params(itm["lines"].astype(jnp.float32), L.tile)
    return e[0,0,0,0] + p[0].astype(jnp.float32)
def prepass_only(itm, jb, jc):
    bw = fe.prepass_winding(tuple(jb), L.tile)
    cw = fe.prepass_winding((jc,), L.tile)
    return bw[0,0,0] + cw[0,0,0]
bench("full", full)
bench("edge prep only", prep_only)
bench("prepass only", prepass_only)
