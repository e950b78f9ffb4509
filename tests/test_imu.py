"""IMU preintegration: deltas vs analytic trajectory, bias Jacobians."""

import numpy as np

from orbslam3_tpu.imu.preintegration import GRAVITY, Bias, Calib, ImuPoint, Preintegrated
from orbslam3_tpu.utils.lie import SE3, so3_exp

RNG = np.random.default_rng(2)


def _simulate(n=200, dt=0.005, bias=None):
    """Body trajectory with constant world acceleration and constant body
    angular rate; returns samples (with gravity + bias) and ground truth."""
    w_body = np.array([0.3, -0.2, 0.5])
    a_world = np.array([0.4, 0.1, -0.2])
    bias = bias or Bias()
    r = np.eye(3)
    v = np.zeros(3)
    p = np.zeros(3)
    accs, gyros, dts = [], [], []
    for k in range(n):
        # true specific force in body frame: R^T (a_world - g)
        f_body = r.T @ (a_world - GRAVITY)
        accs.append(f_body + bias.ba)
        gyros.append(w_body + bias.bg)
        dts.append(dt)
        # integrate the true state with the same discretization as the
        # preintegrator (so deltas compare exactly)
        a_w = r @ f_body + GRAVITY
        p = p + v * dt + 0.5 * a_w * dt * dt
        v = v + a_w * dt
        r = r @ so3_exp(w_body * dt)
    return np.array(accs), np.array(gyros), np.array(dts), (r, v, p)


def test_preintegration_matches_truth_zero_bias():
    accs, gyros, dts, (r, v, p) = _simulate()
    pre = Preintegrated(Bias(), Calib(SE3()))
    pre.integrate_batch(accs, gyros, dts)
    T = dts.sum()
    np.testing.assert_allclose(pre.dR, r, atol=1e-9)
    # dV, dP relate to the true state via gravity removal
    np.testing.assert_allclose(pre.dV, v - GRAVITY * T, atol=1e-9)
    np.testing.assert_allclose(pre.dP, p - 0.5 * GRAVITY * T * T, atol=1e-8)


def test_bias_jacobians_first_order():
    bias_true = Bias(np.array([0.05, -0.02, 0.03]), np.array([0.004, 0.006, -0.003]))
    accs, gyros, dts, _ = _simulate(bias=bias_true)
    # integrate believing bias is zero
    pre0 = Preintegrated(Bias(), Calib(SE3()))
    pre0.integrate_batch(accs, gyros, dts)
    # integrate with the true bias (reference result)
    pre1 = Preintegrated(bias_true, Calib(SE3()))
    pre1.integrate_batch(accs, gyros, dts)
    # first-order corrected deltas from pre0 should approximate pre1
    np.testing.assert_allclose(
        pre0.get_delta_rotation(bias_true), pre1.dR, atol=2e-4
    )
    np.testing.assert_allclose(
        pre0.get_delta_velocity(bias_true), pre1.dV, atol=2e-3
    )
    np.testing.assert_allclose(
        pre0.get_delta_position(bias_true), pre1.dP, atol=2e-3
    )


def test_predict_state_dead_reckoning():
    accs, gyros, dts, (r, v, p) = _simulate()
    pre = Preintegrated(Bias(), Calib(SE3()))
    pre.integrate_batch(accs, gyros, dts)
    Twb0 = SE3()  # body starts at origin
    T1, v1 = pre.predict_state(Twb0, np.zeros(3), Bias())
    np.testing.assert_allclose(T1.R, r, atol=1e-9)
    np.testing.assert_allclose(T1.t, p, atol=1e-8)
    np.testing.assert_allclose(v1, v, atol=1e-9)


def test_merge_previous():
    accs, gyros, dts, _ = _simulate(n=100)
    pre_a = Preintegrated(Bias(), Calib(SE3()))
    pre_a.integrate_batch(accs[:40], gyros[:40], dts[:40])
    pre_b = Preintegrated(Bias(), Calib(SE3()))
    pre_b.integrate_batch(accs[40:], gyros[40:], dts[40:])
    pre_b.merge_previous(pre_a)
    pre_full = Preintegrated(Bias(), Calib(SE3()))
    pre_full.integrate_batch(accs, gyros, dts)
    np.testing.assert_allclose(pre_b.dR, pre_full.dR, atol=1e-12)
    np.testing.assert_allclose(pre_b.dP, pre_full.dP, atol=1e-12)
    assert abs(pre_b.dT - pre_full.dT) < 1e-12


def test_covariance_grows_and_is_psd():
    accs, gyros, dts, _ = _simulate(n=150)
    pre = Preintegrated(Bias(), Calib(SE3()))
    pre.integrate_batch(accs, gyros, dts)
    evals = np.linalg.eigvalsh(pre.C)
    assert evals.min() >= -1e-18
    assert pre.C[:3, :3].trace() > 0 and pre.C[6:9, 6:9].trace() > 0
