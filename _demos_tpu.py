import time, jax, numpy as np
from svgrasterize_tpu import scene_from_filepath
from svgrasterize_tpu.core.transform import Transform
import svgrasterize_tpu.render_plan as rp
print("backend:", jax.default_backend(), flush=True)
def run(name, path, width=None):
    scene, ids, size = scene_from_filepath(path, width=width)
    w, h = int(size[0]), int(size[1])
    tr = Transform().matrix(0,1,0,1,0,0)
    t0=time.time()
    L = rp.lower_scene(scene, tr, (0,0,h,w), False)
    if L is None:
        print(f"{name}: not lowerable", flush=True); return
    tl = time.time()-t0
    t0=time.time()
    tiles = rp.execute_lowered(L, (0,0), False); float(tiles[0,0,0,0])
    cold = time.time()-t0
    t0=time.time()
    for _ in range(3):
        tiles = rp.execute_lowered(L, (0,0), False)
    float(tiles[0,0,0,0])
    warm = (time.time()-t0)/3
    print(f"{name}: {w}x{h} tile={L.tile} lower={tl:.2f}s cold={cold:.1f}s warm={warm*1e3:.0f}ms", flush=True)
run("material", "/root/reference/demo/material-design.svg")
run("material-4k", "/root/reference/demo/material-design.svg", width=3840)
run("icons", "/root/reference/demo/icons.svg")
run("prompt", "/root/reference/demo/prompt.svg")
