from compute_path_tracer_tpu.scene import csg_demo
from compute_path_tracer_tpu.render import RenderSession
from compute_path_tracer_tpu.app.config import Settings
import numpy as np
sess = RenderSession(csg_demo(), 128, 128, Settings(debug=0, bounces=4))
img = sess.render(8)
sess.save_image("/tmp/out.png")
a = np.asarray(img)
assert a.shape == (128,128,3) and np.isfinite(a).all() and a.max() > 0
print("smoke drive OK", a.mean())
