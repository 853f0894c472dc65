import jax, numpy as np
from svgrasterize_tpu import scene_from_filepath
from svgrasterize_tpu.core.transform import Transform
from svgrasterize_tpu.text.fonts import DEFAULT_FONTS, FontsDB
import svgrasterize_tpu.render_plan as rp
from svgrasterize_tpu.core.png import read_png
print("backend:", jax.default_backend(), flush=True)
db = FontsDB(); db.register_file(DEFAULT_FONTS)
for name, path, golden in [
    ("material", "/root/reference/demo/material-design.svg", "/root/reference/demo/material-design.png"),
    ("icons", "/root/reference/demo/icons.svg", "/root/reference/demo/icons.png"),
    ("prompt", "/root/reference/demo/prompt.svg", "/root/reference/demo/prompt.png"),
]:
    scene, ids, size = scene_from_filepath(path, fonts=db)
    w, h = int(size[0]), int(size[1])
    out = rp.render_fast(scene, Transform().matrix(0,1,0,1,0,0), (0,0,h,w), False)
    layer, _ = out
    img = np.asarray(layer.convert(pre_alpha=False, linear_rgb=False).image)
    img8 = np.clip(np.round(img*255),0,255).astype(np.int16)
    gold = np.asarray(read_png(open(golden, "rb")), dtype=np.int16)
    a = np.zeros_like(gold); a[:img8.shape[0],:img8.shape[1]] = img8[:gold.shape[0],:gold.shape[1]]
    d = np.abs(a-gold).max(-1)
    print(f"{name}: max {d.max()}  frac>8 {(d>8).mean()*100:.3f}%", flush=True)
