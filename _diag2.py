import numpy as np
import jax
import jax.numpy as jnp

from visualslam_tpu.io.kitti import SyntheticSequence
from visualslam_tpu.frontend import detect_and_describe
from visualslam_tpu.models.matching import match_features
from visualslam_tpu.utils.config import FAST_CONFIG

cfg = FAST_CONFIG
seq = SyntheticSequence(num_frames=8, h=376, w=1248, n_dots=8000, step=0.4)
f0 = seq.frame(0)
f1 = seq.frame(1)
f3 = seq.frame(3)

fe = jax.jit(lambda im: detect_and_describe(im, cfg))
a = fe(jnp.asarray(f0))
b = fe(jnp.asarray(f1))
c = fe(jnp.asarray(f3))

print("valid kp f0:", int(a.keypoints.valid.sum()),
      "f1:", int(b.keypoints.valid.sum()),
      "f3:", int(c.keypoints.valid.sum()))
print("response range f0:", float(a.keypoints.response.min()),
      float(a.keypoints.response.max()))

m_self = match_features(a, a, cfg.match)
m_01 = match_features(a, b, cfg.match)
m_03 = match_features(a, c, cfg.match)
print("matches self:", int(m_self.count()), " 0-1:", int(m_01.count()),
      " 0-3:", int(m_03.count()))

# without ratio/mutual: how many mutual-NN at all
for name, mm in [("self", (a, a)), ("0-1", (a, b)), ("0-3", (a, c))]:
    cfg2 = cfg.match.replace(ratio=1.0, mutual=True)
    m = match_features(mm[0], mm[1], cfg2)
    cfg3 = cfg.match.replace(ratio=0.95, mutual=True)
    m3 = match_features(mm[0], mm[1], cfg3)
    print(f"{name}: mutual-only={int(m.count())} ratio.95={int(m3.count())}")

# keypoint geometric repeatability f0 vs f1: project f0 kps by GT depth flow?
# cheap proxy: nearest detected kp distance histogram
ay = np.asarray(a.keypoints.yx)[np.asarray(a.keypoints.valid)]
by = np.asarray(b.keypoints.yx)[np.asarray(b.keypoints.valid)]
d = np.sqrt(((ay[:, None] - by[None]) ** 2).sum(-1)).min(1)
print("geom repeat: median NN dist px:", np.median(d),
      " frac<2px:", (d < 2).mean())
