"""Checkpointed long sweeps (SURVEY.md §5 checkpoint/resume + §7 step 8's
100k-scenario stretch config): a batched rollout split into chunks via
`batch_rollout(..., cont=True)` must be tick-for-tick identical to one
uninterrupted rollout, and the CLI `sweep --checkpoint` must resume from a
saved pytree (the reference has no serialization anywhere — reset rebuilds
the controller, walking_simulation.py:170-198)."""

import jax
import jax.numpy as jnp
import numpy as np

from quadruped_ctrl_tpu import cli
from quadruped_ctrl_tpu.config import default_config
from quadruped_ctrl_tpu.core.types import Command
from quadruped_ctrl_tpu.sim import batch_rollout as br
from quadruped_ctrl_tpu.utils import checkpoint

CFG = default_config()
BATCH = 2


def _setup():
    key = jax.random.PRNGKey(3)
    terr = br.batch_terrains(BATCH, key, kinds=("plane",))
    states, sims = br.batch_init(CFG, terr, BATCH)
    cmds = Command(
        vel=jnp.tile(jnp.array([[0.4, 0.0, 0.0]], jnp.float32), (BATCH, 1)),
        gait_type=jnp.full((BATCH,), 9, jnp.int32),
        robot_mode=jnp.zeros((BATCH,), jnp.int32),
    )
    return states, sims, cmds, terr


def test_chunked_rollout_matches_uninterrupted():
    states, sims, cmds, terr = _setup()
    s_full, m_full, _ = br.batch_rollout(CFG, states, sims, cmds, terr, 4)

    s_a, m_a, _ = br.batch_rollout(CFG, states, sims, cmds, terr, 2)
    s_b, m_b, _ = br.batch_rollout(CFG, s_a, m_a, cmds, terr, 2, cont=True)

    for full, chunked in [(m_full, m_b), (s_full.core, s_b.core)]:
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-6
            ),
            full,
            chunked,
        )


def test_checkpoint_roundtrip_resume(tmp_path):
    states, sims, cmds, terr = _setup()
    s_a, m_a, _ = br.batch_rollout(CFG, states, sims, cmds, terr, 2)

    path = str(tmp_path / "sweep.npz")
    payload = {"states": s_a, "sims": m_a, "done": jnp.asarray(2, jnp.int32)}
    checkpoint.save(path, payload)
    example = {"states": states, "sims": sims,
               "done": jnp.zeros((), jnp.int32)}
    restored = checkpoint.load(path, example)
    assert int(restored["done"]) == 2

    s_b, m_b, _ = br.batch_rollout(
        CFG, restored["states"], restored["sims"], cmds, terr, 1, cont=True
    )
    s_c, m_c, _ = br.batch_rollout(CFG, s_a, m_a, cmds, terr, 1, cont=True)
    np.testing.assert_allclose(np.asarray(m_b.p), np.asarray(m_c.p), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(s_b.core.locomotion.fr_des),
        np.asarray(s_c.core.locomotion.fr_des), atol=1e-6,
    )


def test_cli_sweep_resumes_from_checkpoint(tmp_path, capsys):
    ckpt = str(tmp_path / "cli_sweep.npz")
    args = [
        "sweep", "--batch", "2", "--macros", "2", "--checkpoint", ckpt,
        "--checkpoint-every", "1", "--seed", "1",
    ]
    assert cli.main(args) == 0
    first = capsys.readouterr().out

    # same invocation again: must resume at the recorded macro count and
    # re-emit metrics without redoing the stand phase
    assert cli.main(args) == 0
    second = capsys.readouterr().out
    assert "resumed" in second and "macro 2/2" in second
    assert "robot_ticks_per_s" in first


def test_checkpoint_fingerprint_mismatch_refused(tmp_path):
    """A checkpoint written under different run parameters must be refused,
    not silently resumed (the shape check alone only catches batch-size
    changes)."""
    import pytest
    import jax.numpy as jnp

    from quadruped_ctrl_tpu.utils import checkpoint

    tree = {"a": jnp.arange(4, dtype=jnp.float32)}
    path = str(tmp_path / "ck.npz")
    checkpoint.save(path, tree, fingerprint={"seed": 0, "terrains": "plane"})
    # same fingerprint loads
    out = checkpoint.load(path, tree,
                          fingerprint={"seed": 0, "terrains": "plane"})
    assert int(out["a"][3]) == 3
    # different run parameters are refused
    with pytest.raises(ValueError, match="different run"):
        checkpoint.load(path, tree,
                        fingerprint={"seed": 1, "terrains": "plane"})
    # structural mismatch is a clear error, not a stripped assert
    with pytest.raises(ValueError, match="leaves"):
        checkpoint.load(path, {"a": jnp.zeros(4), "b": jnp.zeros(2)},
                        fingerprint={"seed": 0, "terrains": "plane"})
