import numpy as np, jax, time
jax.config.update('jax_default_device', jax.devices('cpu')[0])
from mavmap_tpu.features.detector import detect_image
from mavmap_tpu.ops import matching
import jax.numpy as jnp

rng = np.random.default_rng(0)
# synthetic textured image: random gaussian blobs
H, W = 480, 640
img = np.zeros((H, W), np.float32)
yy, xx = np.mgrid[0:H, 0:W]
blobs = []
for _ in range(150):
    cy, cx = rng.uniform(20, H-20), rng.uniform(20, W-20)
    s = rng.uniform(2, 6); a = rng.uniform(50, 255) * rng.choice([-1,1])
    img += a*np.exp(-(((yy-cy)**2 + (xx-cx)**2)/(2*s*s)))
    blobs.append((cx, cy))
img = np.clip(img - img.min(), 0, 255)

t0=time.time()
kp1, d1 = detect_image(img, max_features=512)
print(f'detected {len(kp1)} features (+{time.time()-t0:.1f}s)')
# shifted copy
shift = (7, 13)
img2 = np.roll(img, shift, axis=(0,1))
kp2, d2 = detect_image(img2, max_features=512)
print(f'second image: {len(kp2)} features')
# match
from mavmap_tpu.features.provider import Features
f1 = Features.from_arrays(kp1, d1, 512); f2 = Features.from_arrays(kp2, d2, 512)
mt, ok = matching.match_brute_force(jnp.asarray(f1.descriptors), jnp.asarray(f2.descriptors),
                                    jnp.asarray(f1.mask), jnp.asarray(f2.mask))
mt = np.asarray(mt); okn = np.asarray(ok) & f1.mask
rows = np.where(okn)[0]
disp = f2.keypoints[mt[rows]] - f1.keypoints[rows]
good = np.abs(disp - np.array([shift[1], shift[0]])).max(axis=1) < 2.0
print(f'matches {okn.sum()}, consistent-with-shift: {good.sum()} ({good.mean()*100:.0f}%)')
# blob recall: detected kp near blob centers?
from scipy.spatial import cKDTree
tree = cKDTree(kp1)
dd, _ = tree.query(np.array(blobs))
print(f'blob recall @3px: {(dd<3).mean()*100:.0f}%')
