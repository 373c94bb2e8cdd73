"""StyleGAN2 adversarial objectives (loss parity: training/loss_fullbody.py).

R1 is computed with jax.grad through the discriminator — the reason the ops
core is lax-composed (2nd-order autodiff without custom VJPs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def g_nonsat_loss(fake_logits):
    """Non-saturating generator loss: softplus(-D(G(z)))
    (loss_fullbody.py:148-150)."""
    return jnp.mean(jax.nn.softplus(-fake_logits))


def d_logistic_loss(real_logits=None, fake_logits=None):
    """Discriminator logistic loss terms (loss_fullbody.py:226-257).

    Returns sum of softplus(fake) (for fakes) and softplus(-real) (for
    reals); either side may be None.
    """
    loss = 0.0
    if fake_logits is not None:
        loss = loss + jnp.mean(jax.nn.softplus(fake_logits))
    if real_logits is not None:
        loss = loss + jnp.mean(jax.nn.softplus(-real_logits))
    return loss


def r1_penalty(d_apply, real_img, *d_args, **d_kwargs):
    """R1 gradient penalty: mean over batch of sum-of-squares of
    d D(real)/d real (loss_fullbody.py:259-274; gamma/2 scaling applied by
    the caller).

    d_apply: img -> logits (closure over params and conditioning).
    """
    def scalar_out(img):
        return jnp.sum(d_apply(img, *d_args, **d_kwargs))

    grads = jax.grad(scalar_out)(real_img)
    return jnp.mean(jnp.sum(jnp.square(grads), axis=(1, 2, 3)))
