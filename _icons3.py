import time, jax
from svgrasterize_tpu import scene_from_filepath
from svgrasterize_tpu.core.transform import Transform
import svgrasterize_tpu.render_plan as rp
print("backend:", jax.default_backend(), flush=True)
scene, ids, size = scene_from_filepath("/root/reference/demo/icons.svg")
w, h = int(size[0]), int(size[1])
L = rp.lower_scene(scene, Transform().matrix(0,1,0,1,0,0), (0,0,h,w), False)
cs = rp.CompiledScene(L, (0,0,h,w), False)
tiles = cs.render_tiles(); float(tiles[0,0,0,0])
t0=time.time()
for _ in range(5): tiles = cs.render_tiles()
float(tiles[0,0,0,0])
print(f"icons serving: {(time.time()-t0)/5*1e3:.1f}ms", flush=True)
