"""Homogeneous 4x4 transforms.

Counterpart of include/mitsuba/core/transform.h. A Transform is stored as the
pair (matrix, inverse-transpose) exactly like the reference so that normals
transform correctly; constructors are host-side (numpy-friendly) but all
application functions are jittable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .math import normalize
from .types import pytree_dataclass


_PREC = jax.lax.Precision.HIGHEST  # geometry transforms stay exact f32


@pytree_dataclass
class Transform:
    m: jnp.ndarray        # (..., 4, 4)
    inv_t: jnp.ndarray    # (..., 4, 4) inverse transpose

    # -- constructors ---------------------------------------------------------
    @staticmethod
    def from_matrix(m):
        if isinstance(m, (jax.Array, jax.core.Tracer)):
            m = jnp.asarray(m, dtype=jnp.float32)
            inv = jnp.linalg.inv(m)
            return Transform(m=m, inv_t=jnp.swapaxes(inv, -1, -2))
        # host inputs stay host-side (numpy leaves of the scene pytree):
        # scene construction must not touch the device — any
        # device-to-host readback (builders call np.asarray on transforms)
        # permanently degrades the TPU relay's dispatch latency
        m = np.asarray(m, dtype=np.float32)
        inv = np.linalg.inv(m.astype(np.float64)).astype(np.float32)
        return Transform(m=m, inv_t=np.swapaxes(inv, -1, -2))

    @staticmethod
    def identity():
        return Transform.from_matrix(np.eye(4, dtype=np.float32))

    @staticmethod
    def translate(v):
        m = np.eye(4, dtype=np.float32)
        m[:3, 3] = np.asarray(v, dtype=np.float32)
        return Transform.from_matrix(m)

    @staticmethod
    def scale(v):
        v = np.broadcast_to(np.asarray(v, dtype=np.float32), (3,))
        m = np.diag(np.concatenate([v, [1.0]]).astype(np.float32))
        return Transform.from_matrix(m)

    @staticmethod
    def rotate(axis, angle_deg):
        """Rotation about an axis by an angle in degrees (reference convention)."""
        a = np.asarray(axis, dtype=np.float64)
        a = a / np.linalg.norm(a)
        th = np.deg2rad(float(angle_deg))
        c, s = np.cos(th), np.sin(th)
        x, y, z = a
        K = np.array([[0, -z, y], [z, 0, -x], [-y, x, 0]])
        R = np.eye(3) + s * K + (1 - c) * (K @ K)
        m = np.eye(4, dtype=np.float32)
        m[:3, :3] = R.astype(np.float32)
        return Transform.from_matrix(m)

    @staticmethod
    def look_at(origin, target, up):
        """Camera-to-world: +z looks at target, +y is up, +x right
        (reference: transform.h ``look_at``; left-handed like Mitsuba)."""
        origin = np.asarray(origin, dtype=np.float64)
        target = np.asarray(target, dtype=np.float64)
        up = np.asarray(up, dtype=np.float64)
        dir_ = target - origin
        dir_ = dir_ / np.linalg.norm(dir_)
        left = np.cross(up / np.linalg.norm(up), dir_)
        left = left / np.linalg.norm(left)
        new_up = np.cross(dir_, left)
        m = np.eye(4, dtype=np.float32)
        m[:3, 0] = left
        m[:3, 1] = new_up
        m[:3, 2] = dir_
        m[:3, 3] = origin
        return Transform.from_matrix(m)

    @staticmethod
    def perspective(fov_deg, near, far):
        """Projective transform mapping the view frustum to [0,1]^2 in x,y
        (reference: transform.h ``perspective``)."""
        recip = 1.0 / (far - near)
        cot = 1.0 / np.tan(np.deg2rad(float(fov_deg)) / 2.0)
        m = np.array(
            [
                [cot, 0, 0, 0],
                [0, cot, 0, 0],
                [0, 0, far * recip, -near * far * recip],
                [0, 0, 1, 0],
            ],
            dtype=np.float32,
        )
        return Transform.from_matrix(m)

    # -- application ----------------------------------------------------------
    def transform_point(self, p):
        ph = jnp.matmul(self.m[..., :3, :3], p[..., None], precision=_PREC)
        ph = ph[..., 0] + self.m[..., :3, 3]
        w = jnp.sum(self.m[..., 3, :3] * p, axis=-1) + self.m[..., 3, 3]
        return ph / w[..., None]

    def transform_affine_point(self, p):
        return jnp.matmul(self.m[..., :3, :3], p[..., None], precision=_PREC)[..., 0] + self.m[..., :3, 3]

    def transform_vector(self, v):
        return jnp.matmul(self.m[..., :3, :3], v[..., None], precision=_PREC)[..., 0]

    def transform_normal(self, n):
        return jnp.matmul(self.inv_t[..., :3, :3], n[..., None], precision=_PREC)[..., 0]

    def transform_unit_vector(self, v):
        return normalize(self.transform_vector(v))

    def transform_ray(self, o, d):
        return self.transform_affine_point(o), self.transform_vector(d)

    def inverse(self):
        xp = np if isinstance(self.m, np.ndarray) else jnp
        return Transform(m=xp.swapaxes(self.inv_t, -1, -2),
                         inv_t=xp.swapaxes(self.m, -1, -2))

    def __matmul__(self, other):
        return Transform(m=self.m @ other.m, inv_t=self.inv_t @ other.inv_t)

    @property
    def translation(self):
        return self.m[..., :3, 3]


def as_transform(t) -> Transform:
    """Accept Transform | 4x4 array-like | dict | list-of-dicts | None.

    Dict forms mirror the XML/dict loader's transform tags (xml.cpp Tag
    handling): {'type': 'look_at'|'translate'|'scale'|'rotate'|'matrix', ...}.
    A list of such dicts composes left-to-right like successive XML child
    tags (each new op premultiplies: last listed is applied last)."""
    if t is None:
        return Transform.identity()
    if isinstance(t, Transform):
        return t
    if isinstance(t, dict):
        kind = t["type"]
        if kind in ("look_at", "lookat"):
            return Transform.look_at(t.get("origin", [0, 0, 0]),
                                     t.get("target", [0, 0, 1]),
                                     t.get("up", [0, 1, 0]))
        if kind == "translate":
            return Transform.translate(t.get("value", [0, 0, 0]))
        if kind == "scale":
            return Transform.scale(t.get("value", 1.0))
        if kind == "rotate":
            return Transform.rotate(t.get("axis", [0, 0, 1]),
                                    t.get("angle", 0.0))
        if kind == "matrix":
            return Transform.from_matrix(np.asarray(t["value"], np.float32)
                                         .reshape(4, 4))
        raise ValueError(f"unknown transform dict type {kind!r}")
    if isinstance(t, (list, tuple)) and t and isinstance(t[0], dict):
        out = Transform.identity()
        for step in t:
            out = as_transform(step) @ out
        return out
    return Transform.from_matrix(np.asarray(t, dtype=np.float32))


@pytree_dataclass
class AnimatedTransform:
    """Keyframed rigid+scale transform (transform.h:364 AnimatedTransform).

    Keyframe matrices are polar-decomposed at build time into
    (translation, rotation quaternion, 3x3 stretch) exactly like the
    reference's enoki::transform_decompose; ``eval(time)`` lerps
    translation/stretch and slerps the rotation, then recomposes — so
    interpolated frames stay rigid for rigid keyframes. Clamped outside the
    keyframe range.
    """

    times: jnp.ndarray         # (K,)
    translations: jnp.ndarray  # (K, 3)
    quats: jnp.ndarray         # (K, 4) (w, x, y, z), sign-aligned
    stretches: jnp.ndarray     # (K, 3, 3) symmetric

    @staticmethod
    def from_keyframes(frames):
        """frames: iterable of (time, Transform | anything as_transform
        accepts), at least one; times must be strictly increasing."""
        import numpy as onp

        ts, trs, qs, ss = [], [], [], []
        for t, tr in frames:
            m = onp.asarray(as_transform(tr).m, onp.float64)
            a = m[:3, :3]
            # polar decomposition a = R S via SVD (S symmetric PSD)
            u, sig, vt = onp.linalg.svd(a)
            r = u @ vt
            if onp.linalg.det(r) < 0:  # keep a proper rotation
                u[:, -1] *= -1.0
                sig[-1] *= -1.0
                r = u @ vt
            s = vt.T @ onp.diag(sig) @ vt
            # rotation -> quaternion (w, x, y, z)
            tr_r = onp.trace(r)
            if tr_r > 0:
                w = onp.sqrt(1.0 + tr_r) / 2.0
                q = onp.array([w, (r[2, 1] - r[1, 2]) / (4 * w),
                               (r[0, 2] - r[2, 0]) / (4 * w),
                               (r[1, 0] - r[0, 1]) / (4 * w)])
            else:
                i = int(onp.argmax(onp.diag(r)))
                j, k = (i + 1) % 3, (i + 2) % 3
                x = onp.sqrt(max(1.0 + r[i, i] - r[j, j] - r[k, k], 0.0)) / 2.0
                q = onp.zeros(4)
                q[1 + i] = x
                q[0] = (r[k, j] - r[j, k]) / (4 * x)
                q[1 + j] = (r[j, i] + r[i, j]) / (4 * x)
                q[1 + k] = (r[k, i] + r[i, k]) / (4 * x)
            if qs and onp.dot(qs[-1], q) < 0:
                q = -q  # shortest-arc slerp
            ts.append(float(t))
            trs.append(m[:3, 3])
            qs.append(q)
            ss.append(s)
        return AnimatedTransform(
            times=jnp.asarray(ts, jnp.float32),
            translations=jnp.asarray(onp.stack(trs), jnp.float32),
            quats=jnp.asarray(onp.stack(qs), jnp.float32),
            stretches=jnp.asarray(onp.stack(ss), jnp.float32))

    def eval(self, time) -> Transform:
        """Interpolated Transform at (batched) ``time``."""
        time = jnp.asarray(time)
        k = self.times.shape[0]
        if k == 1:
            m3 = _quat_to_mat(self.quats[0]) @ self.stretches[0]
            return _compose(m3, self.translations[0])
        i1 = jnp.clip(jnp.searchsorted(self.times, time, side="right"),
                      1, k - 1)
        i0 = i1 - 1
        t0 = self.times[i0]
        t1 = self.times[i1]
        f = jnp.clip((time - t0) / jnp.maximum(t1 - t0, 1e-12), 0.0, 1.0)

        trans = (1 - f)[..., None] * self.translations[i0] \
            + f[..., None] * self.translations[i1]
        stretch = ((1 - f)[..., None, None] * self.stretches[i0]
                   + f[..., None, None] * self.stretches[i1])
        q0 = self.quats[i0]
        q1 = self.quats[i1]
        dot = jnp.sum(q0 * q1, -1)
        q1 = jnp.where(dot[..., None] < 0, -q1, q1)
        dot = jnp.abs(dot)
        theta = jnp.arccos(jnp.clip(dot, -1.0, 1.0))
        sin_t = jnp.sin(theta)
        use_lerp = sin_t < 1e-4
        w0 = jnp.where(use_lerp, 1 - f, jnp.sin((1 - f) * theta)
                       / jnp.where(use_lerp, 1.0, sin_t))
        w1 = jnp.where(use_lerp, f, jnp.sin(f * theta)
                       / jnp.where(use_lerp, 1.0, sin_t))
        q = w0[..., None] * q0 + w1[..., None] * q1
        q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
        m3 = jnp.matmul(_quat_to_mat(q), stretch, precision=_PREC)
        return _compose(m3, trans)


def _quat_to_mat(q):
    """(..., 4) wxyz quaternion -> (..., 3, 3) rotation."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w),
                   2 * (x * z + y * w)], -1),
        jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z),
                   2 * (y * z - x * w)], -1),
        jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w),
                   1 - 2 * (x * x + y * y)], -1),
    ], -2)


def _compose(m3, trans):
    """(batched) 3x3 + translation -> Transform with inverse-transpose."""
    batch = m3.shape[:-2]
    m = jnp.zeros(batch + (4, 4))
    m = m.at[..., :3, :3].set(m3)
    m = m.at[..., :3, 3].set(trans)
    m = m.at[..., 3, 3].set(1.0)
    inv3 = jnp.linalg.inv(m3)
    inv = jnp.zeros(batch + (4, 4))
    inv = inv.at[..., :3, :3].set(inv3)
    inv = inv.at[..., :3, 3].set(
        -jnp.matmul(inv3, trans[..., None], precision=_PREC)[..., 0])
    inv = inv.at[..., 3, 3].set(1.0)
    return Transform(m=m, inv_t=jnp.swapaxes(inv, -1, -2))


def as_animated_transform(t):
    """Returns an AnimatedTransform for animation-dict inputs
    ({'type': 'animation', 'keyframes': [[time, transform], ...]}), else
    None (the input is a static transform for ``as_transform``)."""
    if isinstance(t, AnimatedTransform):
        return t
    if isinstance(t, dict) and t.get("type") == "animation":
        return AnimatedTransform.from_keyframes(t["keyframes"])
    return None
