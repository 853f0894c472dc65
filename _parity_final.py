import jax, numpy as np, time
from svgrasterize_tpu import scene_from_filepath
from svgrasterize_tpu.core.transform import Transform
import svgrasterize_tpu.render_plan as rp
from svgrasterize_tpu.core.png import read_png
print("backend:", jax.default_backend(), flush=True)
for name, path, golden in [
    ("material", "/root/reference/demo/material-design.svg", "/root/reference/demo/material-design.png"),
    ("icons", "/root/reference/demo/icons.svg", "/root/reference/demo/icons.png"),
    ("prompt", "/root/reference/demo/prompt.svg", "/root/reference/demo/prompt.png"),
]:
    scene, ids, size = scene_from_filepath(path)
    w, h = int(size[0]), int(size[1])
    tr = Transform().matrix(0,1,0,1,0,0)
    out = rp.render_fast(scene, tr, (0,0,h,w), linear_rgb=False)
    if out is None:
        print(f"{name}: falls back to interpreter"); 
        layer, _ = scene.render(tr, viewport=(0,0,h,w))
    else:
        layer, hull = out
    img = np.asarray(layer.convert(pre_alpha=False, linear_rgb=False).image)
    img8 = np.clip(np.round(img*255), 0, 255).astype(np.int16)
    gold = np.asarray(read_png(open(golden, "rb")), dtype=np.int16)
    gh, gw = gold.shape[:2]
    a = np.zeros_like(gold)
    a[:min(gh,img8.shape[0]), :min(gw,img8.shape[1])] = img8[:gh,:gw]
    d = np.abs(a - gold).max(-1)
    print(f"{name}: max {d.max()}  frac>8 {(d>8).mean()*100:.3f}%", flush=True)
