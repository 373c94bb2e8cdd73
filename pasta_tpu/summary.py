"""Module summary table (reference torch_utils/misc.py:201-269).

The reference hooks every submodule and prints a table of parameter/buffer
counts and output shapes as a startup smoke test
(training_loop_fullbody.py:421-435). Here the same table comes from an
abstract trace (jax.eval_shape through flax's tabulate) — no device compute,
so it is safe to run on every startup.
"""

from __future__ import annotations

import numpy as np
import jax


def _count(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


def print_module_summary(model, variables, *args, max_depth=2, **kwargs):
    """Print per-submodule parameter/buffer counts + output shapes.

    args/kwargs are the model call inputs (concrete or ShapeDtypeStructs).
    Returns the table string (also printed).
    """
    import flax.linen as nn

    try:
        table = nn.tabulate(
            model, jax.random.PRNGKey(0),
            depth=max_depth,
            show_repeated=False,
            console_kwargs={"width": 120, "force_terminal": False},
        )(*args, **kwargs)
    except Exception as e:  # tabulate needs rich; fall back to counts only
        params = variables.get("params", {})
        buffers = variables.get("buffers", {})
        table = (f"<module table unavailable: {e}>\n"
                 f"{type(model).__name__}: {_count(params)} parameters, "
                 f"{_count(buffers)} buffers")
    print(table, flush=True)
    return table


def summarize_state(state) -> str:
    """One-line parameter accounting for the training state."""
    line = (f"G params {_count(state.g_params):,} | "
            f"D params {_count(state.d_params):,} | "
            f"D_parsing params {_count(state.dp_params):,} | "
            f"G buffers {_count(state.g_buffers):,}")
    print(line, flush=True)
    return line
