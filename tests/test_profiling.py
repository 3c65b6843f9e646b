"""Profiler trace summary (utils/profiling.py): the reference-style top-op
table (reference models/model.py:613-622) from a jax trace directory."""

import jax
import jax.numpy as jnp

from efficientconformer_tpu.utils.profiling import (
    format_op_table,
    print_trace_summary,
    summarize_trace,
)


def test_summarize_trace_finds_device_ops(tmp_path, capsys):
    log_dir = str(tmp_path / "profile")
    with jax.profiler.trace(log_dir):
        x = jnp.ones((256, 256))

        @jax.jit
        def f(x):
            for _ in range(4):
                x = jnp.tanh(x @ x)
            return x

        f(x).block_until_ready()

    rows = summarize_trace(log_dir, top=10)
    assert rows, "no rows parsed from the trace"
    names = " ".join(n for n, _, _ in rows)
    assert "dot" in names or "fusion" in names or "tanh" in names, names
    # no python host frames leaked into the table
    assert not any(n.startswith("$") for n, _, _ in rows)
    for _, total_us, count in rows:
        assert total_us > 0 and count >= 1

    table = format_op_table(rows)
    assert "Total" in table and "%" in table
    assert len(table.splitlines()) == len(rows) + 2

    assert print_trace_summary(log_dir) is True
    out = capsys.readouterr().out
    assert "top" in out and "Op" in out


def test_summary_without_trace(tmp_path, capsys):
    assert print_trace_summary(str(tmp_path / "empty")) is False
    assert "no trace" in capsys.readouterr().out
