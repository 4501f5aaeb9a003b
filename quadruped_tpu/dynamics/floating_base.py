"""Batched floating-base (Featherstone) rigid-body dynamics, fixed topology.

Capability parity with the reference's `FloatingBaseModel<T>`
(quadruped/src/dynamics/floating_base_model.cpp): forward kinematics (:469),
contact Jacobians + bias accelerations (:541, :587), generalized gravity and
Coriolis forces (:607, :633), CRBA mass matrix (:750, :774), inverse dynamics
(:841) and ABA forward dynamics (:876) — for the shared quadruped topology
built by `BuildDynamicModel` (quadruped/src/robots/qr_robot_a1_sim.cpp:176):
a 6-DoF floating trunk plus 4 legs x (abad about X, hip about Y, knee about
Y). The reference builds this model with gear ratio 1 and ~1e-8 rotor inertia
(:270-276), i.e. rotors disabled, so the TPU model is rotor-free by design.

TPU-first redesign: the reference walks heap-allocated body arrays with
virtual joint types at 500 Hz; here the topology is *static* (13 bodies,
chains of depth 3), so every sweep unrolls at trace time into pure dense ops
over [..., 6] / [..., 6, 6] arrays that vmap over scenario batches. All
state is explicit; the generalized-coordinate convention matches the
reference/MIT: qdd/velocity vector = [omega_body(3); v_body(3); qdot(12)],
with base angular/linear velocity expressed in the *body* frame, and the
mass matrix/Jacobians laid out accordingly (18 x 18, 3 x 18).

Body indexing: 0 = trunk; for leg l in FR,FL,RR,RL: abad = 1+3l,
hip = 2+3l, knee = 3+3l.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from flax import struct

from quadruped_tpu.core import se3
from quadruped_tpu.dynamics import spatial as sp
from quadruped_tpu.robots.params import RobotParams, SIDE_SIGN

NUM_BODIES = 13       # trunk + 12 links
NUM_DOF = 18          # 6 floating + 12 revolute
PARENTS = (-1,) + tuple(p for l in range(4) for p in (0, 1 + 3 * l, 2 + 3 * l))
JOINT_AXES = (None,) + (0, 1, 1) * 4  # abad about X, hip/knee about Y
GRAVITY = (0.0, 0.0, -9.81)


@struct.dataclass
class FloatingBaseModel:
    """Static model data (a pytree; batchable across robots)."""

    xtree_r: jnp.ndarray        # [13, 3] parent->joint translations (body 0 unused)
    inertias: jnp.ndarray       # [13, 6, 6] spatial inertias in link frames
    foot_offset: jnp.ndarray    # [4, 3] foot point in knee-link frame


@struct.dataclass
class FbState:
    """Dynamic state of the floating-base model."""

    quat: jnp.ndarray        # [4] body->world
    position: jnp.ndarray    # [3] world
    omega_body: jnp.ndarray  # [3] base angular velocity, body frame
    vel_body: jnp.ndarray    # [3] base linear velocity, body frame
    q: jnp.ndarray           # [12]
    dq: jnp.ndarray          # [12]


def build_model(params: RobotParams) -> FloatingBaseModel:
    """Assemble the 13-body model from the robot parameter catalog."""
    dtype = params.hip_offset.dtype
    xtree = [jnp.zeros(3, dtype)]
    inertias = [sp.spatial_inertia(params.body_mass,
                                   jnp.zeros(3, dtype), params.body_inertia)]
    link_masses = params.links_mass
    for leg in range(4):
        side = SIDE_SIGN[leg]
        # abad joint sits at hip_offset; hip at signed hip link; knee below.
        xtree.append(params.hip_offset[leg])
        xtree.append(jnp.stack([jnp.zeros((), dtype),
                                params.hip_length * side,
                                jnp.zeros((), dtype)]))
        xtree.append(jnp.stack([jnp.zeros((), dtype), jnp.zeros((), dtype),
                                -params.upper_length]))
        for link in range(3):
            m = link_masses[link]
            com = params.links_com_pos[link]
            i_com = params.links_inertia[link]
            if side < 0:
                m, com, i_com = sp.flip_inertia_along_y(m, com, i_com)
            inertias.append(sp.spatial_inertia(m, com, i_com))
    # Foot contact point on the knee link: small lateral offset with the
    # leg's side sign (addGroundContactPoint, qr_robot_a1_sim.cpp:318-330).
    foot_offset = jnp.stack([
        jnp.stack([jnp.zeros((), dtype),
                   jnp.asarray(-0.004 * SIDE_SIGN[leg], dtype),
                   -params.lower_length])
        for leg in range(4)])
    return FloatingBaseModel(
        xtree_r=jnp.stack(xtree), inertias=jnp.stack(inertias),
        foot_offset=foot_offset)


class _Kinematics(NamedTuple):
    """Per-body quantities from the forward pass (lists indexed by body)."""

    xup: list          # [6,6] child-from-parent motion transforms
    x_base: list       # [6,6] body-from-base transforms
    v: list            # [6] spatial velocity in body frame
    c: list            # [6] velocity-product acceleration (crm(v) S qd)
    s: list            # [6] joint motion subspace (None for base)


def _forward_pass(model: FloatingBaseModel, q: jnp.ndarray,
                  dq: jnp.ndarray, v_base: jnp.ndarray) -> _Kinematics:
    """Unrolled Featherstone outward sweep (forwardKinematics :469)."""
    dtype = q.dtype
    batch = q.shape[:-1]
    eye6 = jnp.broadcast_to(jnp.eye(6, dtype=dtype), batch + (6, 6))
    xup = [eye6]
    x_base = [eye6]
    v = [v_base]
    c = [jnp.zeros(batch + (6,), dtype)]
    s_list = [None]
    for i in range(1, NUM_BODIES):
        ji = i - 1  # joint/dof index
        axis = JOINT_AXES[i]
        xj = sp.joint_transform_revolute(axis, q[..., ji])
        xt = sp.spatial_transform(jnp.eye(3, dtype=dtype), model.xtree_r[i])
        xup_i = xj @ xt
        s = sp.joint_motion_subspace(axis, dtype)
        vj = s * dq[..., ji, None]
        v_i = jnp.einsum("...ij,...j->...i", xup_i, v[PARENTS[i]]) + vj
        c_i = sp.motion_cross(v_i, vj)
        xup.append(xup_i)
        x_base.append(xup_i @ x_base[PARENTS[i]])
        v.append(v_i)
        c.append(c_i)
        s_list.append(s)
    return _Kinematics(xup=xup, x_base=x_base, v=v, c=c, s=s_list)


def mass_matrix(model: FloatingBaseModel, q: jnp.ndarray) -> jnp.ndarray:
    """[..., 18, 18] CRBA (massMatrix :774 / compositeInertias :750)."""
    dtype = q.dtype
    batch = q.shape[:-1]
    kin = _forward_pass(model, q, jnp.zeros_like(q),
                        jnp.zeros(batch + (6,), dtype))
    ic = [jnp.broadcast_to(model.inertias[i], batch + (6, 6))
          for i in range(NUM_BODIES)]
    # Backward composite sweep.
    for i in range(NUM_BODIES - 1, 0, -1):
        xt = jnp.swapaxes(kin.xup[i], -1, -2)
        ic[PARENTS[i]] = ic[PARENTS[i]] + xt @ ic[i] @ kin.xup[i]

    h = jnp.zeros(batch + (NUM_DOF, NUM_DOF), dtype)
    h = h.at[..., 0:6, 0:6].set(ic[0])
    for i in range(1, NUM_BODIES):
        ji = i - 1
        s = kin.s[i]
        f = jnp.einsum("...ij,j->...i", ic[i], s)  # [.., 6]
        h = h.at[..., 6 + ji, 6 + ji].set(f[..., JOINT_AXES[i]])
        # Walk up the chain to ancestors.
        j = i
        fj = f
        while PARENTS[j] > 0:
            fj = jnp.einsum("...ji,...j->...i", kin.xup[j], fj)
            j = PARENTS[j]
            jj = j - 1
            val = fj[..., JOINT_AXES[j]]
            h = h.at[..., 6 + ji, 6 + jj].set(val)
            h = h.at[..., 6 + jj, 6 + ji].set(val)
        # Base coupling block.
        fb = jnp.einsum("...ji,...j->...i", kin.xup[j], fj)
        h = h.at[..., 0:6, 6 + ji].set(fb)
        h = h.at[..., 6 + ji, 0:6].set(fb)
    return h


def _bias_force_pass(model: FloatingBaseModel, kin: _Kinematics,
                     a_base: jnp.ndarray, batch, dtype,
                     with_velocity: bool) -> jnp.ndarray:
    """RNEA with qdd = 0: generalized force for given base acceleration.

    with_velocity=False zeroes velocity-product terms (pure gravity).
    """
    a = [a_base]
    for i in range(1, NUM_BODIES):
        ai = jnp.einsum("...ij,...j->...i", kin.xup[i], a[PARENTS[i]])
        if with_velocity:
            ai = ai + kin.c[i]
        a.append(ai)
    f = []
    for i in range(NUM_BODIES):
        fi = jnp.einsum("...ij,...j->...i", model.inertias[i], a[i])
        if with_velocity:
            fi = fi + sp.force_cross(
                kin.v[i], jnp.einsum("...ij,...j->...i",
                                     model.inertias[i], kin.v[i]))
        f.append(fi)
    tau = jnp.zeros(batch + (NUM_DOF,), dtype)
    for i in range(NUM_BODIES - 1, 0, -1):
        tau = tau.at[..., 6 + i - 1].set(f[i][..., JOINT_AXES[i]])
        f[PARENTS[i]] = f[PARENTS[i]] + jnp.einsum(
            "...ji,...j->...i", kin.xup[i], f[i])
    tau = tau.at[..., 0:6].set(f[0])
    return tau


def _gravity_accel_base(quat: jnp.ndarray) -> jnp.ndarray:
    """Spatial 'acceleration' -a_g in the base frame."""
    r = se3.quat_to_rotmat(quat)
    g_world = jnp.asarray(GRAVITY, quat.dtype)
    g_body = jnp.einsum("...ji,j->...i", r, g_world)
    zeros = jnp.zeros_like(g_body)
    return jnp.concatenate([zeros, -g_body], axis=-1)


def gravity_force(model: FloatingBaseModel, state: FbState) -> jnp.ndarray:
    """[..., 18] generalized gravity (generalizedGravityForce :607)."""
    batch = state.q.shape[:-1]
    kin = _forward_pass(model, state.q, jnp.zeros_like(state.q),
                        jnp.zeros(batch + (6,), state.q.dtype))
    return _bias_force_pass(model, kin, _gravity_accel_base(state.quat),
                            batch, state.q.dtype, with_velocity=False)


def coriolis_force(model: FloatingBaseModel, state: FbState) -> jnp.ndarray:
    """[..., 18] generalized Coriolis/centrifugal force
    (generalizedCoriolisForce :633)."""
    batch = state.q.shape[:-1]
    v_base = jnp.concatenate([state.omega_body, state.vel_body], axis=-1)
    kin = _forward_pass(model, state.q, state.dq, v_base)
    zero_accel = jnp.zeros(batch + (6,), state.q.dtype)
    return _bias_force_pass(model, kin, zero_accel, batch, state.q.dtype,
                            with_velocity=True)


def _world_rotations_positions(model: FloatingBaseModel, state: FbState):
    """Per-body world rotation + world joint-origin position lists."""
    r_base = se3.quat_to_rotmat(state.quat)
    kin = _forward_pass(model, state.q, state.dq,
                        jnp.concatenate([state.omega_body, state.vel_body],
                                        axis=-1))
    rots = [r_base]
    poss = [state.position]
    for i in range(1, NUM_BODIES):
        p = PARENTS[i]
        # Joint origin in world; link rotation = parent_rot @ R_joint.
        pos_i = poss[p] + jnp.einsum("...ij,...j->...i", rots[p],
                                     jnp.broadcast_to(model.xtree_r[i],
                                                      state.position.shape))
        e = sp.rotation_part(kin.xup[i])  # child_R_parent
        rot_i = rots[p] @ jnp.swapaxes(e, -1, -2)
        rots.append(rot_i)
        poss.append(pos_i)
    return rots, poss, kin


def foot_positions_world(model: FloatingBaseModel, state: FbState) -> jnp.ndarray:
    """[..., 4, 3] foot (knee contact point) positions in world frame."""
    rots, poss, _ = _world_rotations_positions(model, state)
    feet = []
    for leg in range(4):
        knee = 3 + 3 * leg
        feet.append(poss[knee] + jnp.einsum("...ij,...j->...i", rots[knee],
                                            model.foot_offset[leg]))
    return jnp.stack(feet, axis=-2)


def contact_jacobians(model: FloatingBaseModel, state: FbState):
    """World-frame foot Jacobians + bias accelerations.

    Returns (jc [..., 4, 3, 18], jcdqd [..., 4, 3], p_feet [..., 4, 3]).
    Columns follow the generalized-velocity layout
    [omega_body; v_body; qdot]: linear foot velocity in world =
    Jc @ [w_b; v_b; qd]  (contactJacobians :541, biasAccelerations :587).
    """
    rots, poss, kin = _world_rotations_positions(model, state)
    batch = state.q.shape[:-1]
    dtype = state.q.dtype
    r_base = rots[0]

    jcs, biases, feet = [], [], []
    for leg in range(4):
        knee = 3 + 3 * leg
        p_foot = poss[knee] + jnp.einsum("...ij,...j->...i", rots[knee],
                                         model.foot_offset[leg])
        feet.append(p_foot)
        jc = jnp.zeros(batch + (3, NUM_DOF), dtype)
        # Base columns: v_foot = R(v_b + w_b x r_rel_body) + joint terms.
        r_rel = jnp.einsum("...ji,...j->...i", r_base,
                           p_foot - state.position)  # body frame
        jc = jc.at[..., :, 0:3].set(-r_base @ se3.skew(r_rel))
        jc = jc.at[..., :, 3:6].set(r_base)
        # Chain columns.
        for depth in range(3):
            body = 1 + 3 * leg + depth
            ji = body - 1
            axis_world = rots[body][..., :, JOINT_AXES[body]]
            col = jnp.cross(axis_world, p_foot - poss[body])
            jc = jc.at[..., :, 6 + ji].set(col)
        jcs.append(jc)

        # Bias acceleration Jdot qd: spatial acceleration of the contact
        # point with qdd = 0, from the velocity-product sweep.
        a = [jnp.zeros(batch + (6,), dtype)]
        for i in range(1, NUM_BODIES):
            a.append(jnp.einsum("...ij,...j->...i", kin.xup[i],
                                a[PARENTS[i]]) + kin.c[i])
        a_knee = a[knee]
        v_knee = kin.v[knee]
        # Classical acceleration of the point offset in the link frame:
        # a_pt = a_lin + alpha x r + w x (w x r), rotated to world.
        w = v_knee[..., 0:3]
        vl = v_knee[..., 3:6]
        al = a_knee[..., 3:6]
        aw = a_knee[..., 0:3]
        r_off = model.foot_offset[leg]
        a_pt = (al + jnp.cross(aw, jnp.broadcast_to(r_off, w.shape))
                + jnp.cross(w, vl + jnp.cross(w, jnp.broadcast_to(r_off,
                                                                  w.shape))))
        biases.append(jnp.einsum("...ij,...j->...i", rots[knee], a_pt))
    return (jnp.stack(jcs, axis=-3), jnp.stack(biases, axis=-2),
            jnp.stack(feet, axis=-2))


def inverse_dynamics(model: FloatingBaseModel, state: FbState,
                     qdd: jnp.ndarray) -> jnp.ndarray:
    """[..., 18] tau = H qdd + C + G (inverseDynamics :841)."""
    h = mass_matrix(model, state.q)
    cg = coriolis_force(model, state) + gravity_force(model, state)
    return jnp.einsum("...ij,...j->...i", h, qdd) + cg


def forward_dynamics(model: FloatingBaseModel, state: FbState,
                     tau: jnp.ndarray,
                     foot_forces_world: jnp.ndarray | None = None) -> jnp.ndarray:
    """[..., 18] qdd from applied generalized forces (+ optional world-frame
    foot forces), via the O(n^3) mass-matrix route (runABA :876 capability;
    with 18 DoF the dense solve is faster on the MXU than the O(n)
    articulated sweep's sequential dependency chain)."""
    h = mass_matrix(model, state.q)
    cg = coriolis_force(model, state) + gravity_force(model, state)
    rhs = tau - cg
    if foot_forces_world is not None:
        jc, _, _ = contact_jacobians(model, state)
        rhs = rhs + jnp.einsum("...lji,...lj->...i", jc, foot_forces_world)
    return jnp.linalg.solve(h, rhs[..., None])[..., 0]
