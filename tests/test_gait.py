import numpy as np
import jax.numpy as jnp

from quadruped_ctrl_tpu.gait import gait
from tests import oracle

H_MAX = 16
IB = 13


def params(gait_number):
    return gait.params_for_gait(jnp.asarray(gait_number))


def test_trot_mpc_table_matches_oracle():
    p = params(9)
    offs = np.array([0, 7, 7, 0])
    durs = np.array([7, 7, 7, 7])
    for counter in [0, 13, 26, 13 * 7, 13 * 13, 13 * 14, 500 * 13]:
        seg, _ = gait.phase_of(jnp.asarray(counter), IB, p)
        table = np.asarray(gait.mpc_table(seg, p, H_MAX))
        want = oracle.mpc_table(offs, durs, 14, int(seg), 14)
        np.testing.assert_array_equal(table[:14], want)
        np.testing.assert_array_equal(table[14:], 0)


def test_standing_always_contact():
    p = params(4)
    for counter in [0, 5, 13, 100]:
        seg, phase = gait.phase_of(jnp.asarray(counter), IB, p)
        table = np.asarray(gait.mpc_table(seg, p, H_MAX))
        np.testing.assert_array_equal(table[:14], 1)
        cs = np.asarray(gait.contact_state(phase, p))
        assert (cs > 0).all() or counter == 0
        ss = np.asarray(gait.swing_state(phase, p))
        np.testing.assert_array_equal(ss, 0.0)


def test_trot_contact_swing_complementary():
    p = params(9)
    period = IB * 14
    for counter in range(0, period, 7):
        _, phase = gait.phase_of(jnp.asarray(counter), IB, p)
        cs = np.asarray(gait.contact_state(phase, p))
        ss = np.asarray(gait.swing_state(phase, p))
        for leg in range(4):
            # a leg is either in stance or swing, not both (0 boundary allowed)
            assert cs[leg] == 0.0 or ss[leg] == 0.0
        # diagonal pairs move together in trot
        np.testing.assert_allclose(cs[0], cs[3], atol=1e-6)
        np.testing.assert_allclose(cs[1], cs[2], atol=1e-6)


def test_swing_stance_times():
    p = params(9)
    dt_mpc = 0.002 * 13
    st = np.asarray(gait.stance_time(dt_mpc, p))
    sw = np.asarray(gait.swing_time(dt_mpc, p))
    np.testing.assert_allclose(st, dt_mpc * 7, rtol=1e-6)
    np.testing.assert_allclose(sw, dt_mpc * 7, rtol=1e-6)


def test_phase_wraps():
    p = params(9)
    period = IB * 14
    _, phase0 = gait.phase_of(jnp.asarray(0), IB, p)
    _, phase_wrap = gait.phase_of(jnp.asarray(period), IB, p)
    assert float(phase0) == 0.0
    assert float(phase_wrap) == 0.0


def test_aio_bands():
    h_max = 16
    prev = gait.GaitParams(
        offsets=jnp.zeros(4, jnp.int32),
        durations=jnp.full((4,), 10, jnp.int32),
        h=jnp.asarray(10, jnp.int32),
    )
    # standing band
    p, g, reset = gait.aio_params(
        jnp.asarray(0.0), jnp.asarray(0.0), prev, jnp.asarray(0.0), h_max
    )
    assert int(g) == 4 and int(p.h) == 10
    # mid-speed trot band
    p, g, reset = gait.aio_params(
        jnp.asarray(1.0), jnp.asarray(0.0), prev, jnp.asarray(0.0), h_max
    )
    assert int(g) == 9 and int(p.h) == 14 and bool(reset)
    np.testing.assert_array_equal(np.asarray(p.offsets), [0, 7, 7, 0])
    # fast band: h = -20v + 42 clamped to >= 10
    p, g, _ = gait.aio_params(
        jnp.asarray(1.5), jnp.asarray(0.0), prev, jnp.asarray(0.0), h_max
    )
    assert int(p.h) == 12
    # not at phase boundary: unchanged
    p, g, reset = gait.aio_params(
        jnp.asarray(1.5), jnp.asarray(0.0), prev, jnp.asarray(0.5), h_max
    )
    assert int(p.h) == int(prev.h) and not bool(reset)
