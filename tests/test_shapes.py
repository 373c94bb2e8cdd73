"""Shape contracts (reference torch_utils/misc.py:86-99 assert_shape)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pasta_tpu.shapes import assert_shape, assert_batch_shapes


def test_assert_shape_passes_and_fails():
    x = jnp.zeros((2, 8, 8, 3))
    assert_shape(x, (2, 8, 8, 3))
    assert_shape(x, (None, 8, None, 3))
    with pytest.raises(AssertionError, match="dimension 3"):
        assert_shape(x, (None, 8, 8, 1), name="img")
    with pytest.raises(AssertionError, match="number of dimensions"):
        assert_shape(x, (None, 8, 8))


def test_assert_batch_shapes_ignores_missing():
    batch = {"a": jnp.zeros((2, 4)), "b": jnp.zeros((2, 4, 4, 1))}
    assert_batch_shapes(batch, {"a": (None, 4), "missing": (1, 2)})
    with pytest.raises(AssertionError, match=r"batch\[b\]"):
        assert_batch_shapes(batch, {"b": (None, 4, 4, 3)})


def test_generator_rejects_transposed_input():
    """A channels-first (NCHW) mix-up fails at the boundary, by name."""
    from pasta_tpu.models import Generator
    from tests.test_models import _gen_inputs

    model = Generator(img_resolution=64, channel_base=2048,
                      channel_max=128, conv_clamp=256)
    rng = np.random.RandomState(0)
    inputs = _gen_inputs(rng, 2, 64)
    bad = dict(inputs, pose=jnp.transpose(inputs["pose"], (0, 3, 1, 2)))
    with pytest.raises(AssertionError, match="pose"):
        model.init({"params": jax.random.PRNGKey(0),
                    "noise": jax.random.PRNGKey(1)}, **bad)
