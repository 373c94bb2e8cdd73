"""On-chip verification of the Pallas shift-kernel warp backend.

Compares affine_warp_twopass(use_pallas=True) against the plain-jnp
backend (bit-identical algorithm) and the pointwise-gather oracle on the
real TPU — the CPU test suite only exercises the jnp backend. Run after
touching ops/affine_warp.py kernels:

    python scripts/verify_pallas_warp.py

Expected: pallas==jnp to ~1e-6; PSNR vs gather: exact (>100 dB) for
integer translate / rot90, >30 dB for rotations (hat*hat softening);
grad parity ~1e-6.
"""
import sys
sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
from scipy.ndimage import gaussian_filter
from pasta_tpu.ops.affine_warp import (affine_warp_twopass,
                                       bilinear_warp_gather)
H = 256
rng = np.random.RandomState(0)
img = jnp.asarray(np.stack([gaussian_filter(rng.rand(H, H, 3), (2,2,0))
                            for _ in range(4)]).astype(np.float32))
def mat_of(theta=0., s=1., tx=0., ty=0., aniso=1.):
    c0 = (H-1)/2
    a = np.array([[np.cos(theta)*s*aniso, -np.sin(theta)*s, 0],
                  [np.sin(theta)*s*aniso, np.cos(theta)*s, 0],[0,0,1.]])
    t1 = np.array([[1,0,-c0],[0,1,-c0],[0,0,1.]]); t2 = np.array([[1,0,c0+tx],[0,1,c0+ty],[0,0,1.]])
    return (t2@a@t1).astype(np.float32)
mats = jnp.asarray(np.stack([mat_of(tx=7, ty=-3), mat_of(0.4, 1.2, 1.5, -2.0),
                             mat_of(np.pi/2), mat_of(-1.1, 0.85, 0, 4, 1.2)]))
pal = jax.jit(lambda im: affine_warp_twopass(im, mats, use_pallas=True))(img)
ref = jax.jit(lambda im: affine_warp_twopass(im, mats, use_pallas=False))(img)
gat = jax.jit(lambda im: bilinear_warp_gather(im, mats))(img)
print("pallas vs jnp-backend:", float(jnp.abs(pal - ref).max()), flush=True)
for i, nm in enumerate(["int-translate", "rot+scale", "rot90", "rot+aniso"]):
    mse = float(jnp.mean((pal[i] - gat[i])**2))
    print(f"  {nm:14s} PSNR vs gather: {10*np.log10(1.0/max(mse,1e-16)):.1f} dB", flush=True)
g1 = jax.jit(jax.grad(lambda im: jnp.sum(jnp.sin(3*affine_warp_twopass(im, mats, use_pallas=True)))))(img)
g2 = jax.jit(jax.grad(lambda im: jnp.sum(jnp.sin(3*affine_warp_twopass(im, mats, use_pallas=False)))))(img)
print("grad pallas vs jnp maxerr:", float(jnp.abs(g1-g2).max()), flush=True)
