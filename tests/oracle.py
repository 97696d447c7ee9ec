"""Pure-numpy oracle models of the reference's index/scroll semantics
(operations.h), used to property-test the JAX codecs on tiny grids.

These intentionally re-derive the behavior from the reference's *spec* (as
documented in SURVEY.md and the codec docstrings) with naive scalar code, so
the vectorized implementations are checked against an independent model.
"""

from __future__ import annotations

import numpy as np


class ScrollOracle:
    """Scalar model of the ring-buffer scroll + codecs."""

    def __init__(self, nx, ny, nz, voxel_size):
        self.n = np.array([nx, ny, nz])
        self.voxel = voxel_size
        self.moved = np.zeros(3, np.int64)
        self.equiv = np.zeros(3, np.int64)
        self.stamps = [np.zeros(nx, np.int64), np.zeros(ny, np.int64), np.zeros(nz, np.int64)]
        self.map_center = np.zeros(3)

    @staticmethod
    def _c_trunc(x):
        return int(np.trunc(x))

    def _c_mod(self, s, n):
        return s % n if s >= 0 else -((-s) % n)

    def _corr(self, i, axis):
        n = self.n[axis]
        if i < 0:
            return i + n
        if i >= n:
            return i - n
        return i

    def update_ego(self, pos, global_time, substep=True):
        """updateEgoCenterPos: optionally with the reference's explicit
        quarter-map sub-stepping (operations.h:68-96)."""
        pos = np.asarray(pos, float)
        if substep:
            max_once = min((self.n >> 2) * self.voxel)
            last = getattr(self, "_last_pos", np.zeros(3))
            mv = pos - last
            dist = np.linalg.norm(mv)
            cur = last.copy()
            while dist > max_once:
                cur = cur + mv / dist * max_once
                self._update_params(cur, global_time)
                mv = pos - cur
                dist = np.linalg.norm(mv)
            self._update_params(pos, global_time)
            self._last_pos = pos
        else:
            self._update_params(pos, global_time)

    def _update_params(self, ego, global_time):
        center_steps = np.array([self._c_trunc(e / self.voxel) for e in ego])
        self.map_center = center_steps * self.voxel
        for a in range(3):
            d = int(center_steps[a] - self.moved[a])
            if d > 0:
                for i in range(d):
                    self.stamps[a][self._corr_full(i + self.equiv[a], a)] = global_time
            elif d < 0:
                for i in range(-d):
                    self.stamps[a][self._corr_full(self.n[a] - 1 - i + self.equiv[a], a)] = global_time
            self.moved[a] = center_steps[a]
            self.equiv[a] = self._c_mod(int(self.moved[a]), int(self.n[a]))

    def _corr_full(self, i, axis):
        # The reference applies a single +-N correction; inputs stay in
        # range (-N, 2N) so it equals a full modulo.
        return int(i) % int(self.n[axis])

    # ---- codecs ----
    def global_to_voxel(self, p):
        p = np.asarray(p, float) - self.map_center
        half = (self.n >> 1) * self.voxel
        f = (p + half) / self.voxel
        if np.any(f < 0):
            return None
        m = np.trunc(f).astype(np.int64)
        if np.any(m >= self.n):
            return None
        ring = (m + self.equiv) % self.n
        return self.ring_to_voxel(*ring)

    def ring_to_voxel(self, xi, yi, zi):
        return int((zi * self.n[1] + yi) * self.n[0] + xi)

    def voxel_to_ring(self, v):
        xi = v % self.n[0]
        yi = (v // self.n[0]) % self.n[1]
        zi = v // (self.n[0] * self.n[1])
        return xi, yi, zi

    def voxel_to_global(self, v):
        xi, yi, zi = self.voxel_to_ring(v)
        m = (np.array([xi, yi, zi]) - self.equiv) % self.n
        half = (self.n >> 1) * self.voxel
        return m * self.voxel - half + self.map_center
