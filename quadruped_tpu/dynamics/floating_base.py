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
virtual joint types at 500 Hz; here the four legs are IDENTICAL depth-3
chains that couple only through the trunk, so every sweep is three
sequential chain steps vectorized over a leg axis — [..., 4, 6, 6]
tensors — instead of 13 per-body steps. All small matrix products use the
elementwise broadcast-reduce form (se3.matmul3): XLA pads per-body 6x6
batched matmuls onto the MXU and batched `.at[].set` scatters cost ~10x
roofline (the per-body CRBA measured 8.6 ms at batch 1024 on a v5e; this
layout runs the same math in well under 1 ms). The 18x18 mass matrix and
3x18 Jacobians assemble from blocks — the off-leg couplings are
structurally zero.

Generalized-coordinate convention matches the reference/MIT:
velocity vector = [omega_body(3); v_body(3); qdot(12)], base angular/linear
velocity in the *body* frame. Joint ji = 3*leg + depth; body = 1 + ji.
Leg order FR, FL, RR, RL; depth 0 = abad (X axis), 1 = hip, 2 = knee (Y).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from flax import struct

from quadruped_tpu.core import linalg, se3
from quadruped_tpu.dynamics import spatial as sp
from quadruped_tpu.robots.params import RobotParams, SIDE_SIGN

NUM_BODIES = 13       # trunk + 12 links
NUM_DOF = 18          # 6 floating + 12 revolute
NUM_LEGS = 4
CHAIN = 3             # links per leg
PARENTS = (-1,) + tuple(p for l in range(4) for p in (0, 1 + 3 * l, 2 + 3 * l))
JOINT_AXES = (None,) + (0, 1, 1) * 4  # abad about X, hip/knee about Y
DEPTH_AXES = (0, 1, 1)
GRAVITY = (0.0, 0.0, -9.81)

_mm = se3.matmul3  # elementwise small-matrix product (any m,k,n <= ~8)


def _mv(m: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """[..., m, n] @ [..., n] elementwise (no MXU-padded batched matvec)."""
    return jnp.sum(m * v[..., None, :], axis=-1)


def _mtv(m: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """[..., n, m]^T @ [..., n] elementwise (force transform X^T f)."""
    return jnp.sum(m * v[..., :, None], axis=-2)


@struct.dataclass
class FloatingBaseModel:
    """Static model data (a pytree; batchable across robots)."""

    xtree_r: jnp.ndarray        # [13, 3] parent->joint translations (body 0 unused)
    inertias: jnp.ndarray       # [13, 6, 6] spatial inertias in link frames
    foot_offset: jnp.ndarray    # [4, 3] foot point in knee-link frame

    @property
    def xtree_legs(self) -> jnp.ndarray:
        """[..., 4, 3(depth), 3] leg-stacked parent->joint translations."""
        return self.xtree_r[..., 1:, :].reshape(
            self.xtree_r.shape[:-2] + (NUM_LEGS, CHAIN, 3))

    @property
    def inertia_legs(self) -> jnp.ndarray:
        """[..., 4, 3(depth), 6, 6] leg-stacked link spatial inertias."""
        return self.inertias[..., 1:, :, :].reshape(
            self.inertias.shape[:-3] + (NUM_LEGS, CHAIN, 6, 6))


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


class _LegKinematics(NamedTuple):
    """Leg-stacked quantities from the forward pass.

    xup: [..., 4, 3, 6, 6] child-from-parent motion transforms per depth.
    v:   [..., 4, 3, 6]    spatial velocity in link frame.
    c:   [..., 4, 3, 6]    velocity-product acceleration crm(v) S qd.
    v0:  [..., 6]          base spatial velocity.
    """

    xup: jnp.ndarray
    v: jnp.ndarray
    c: jnp.ndarray
    v0: jnp.ndarray


def _joint_xforms(model: FloatingBaseModel, q: jnp.ndarray) -> jnp.ndarray:
    """[..., 4, 3(depth), 6, 6] X_up per joint (jointXform @ tree xform)."""
    batch = q.shape[:-1]
    q_legs = q.reshape(batch + (NUM_LEGS, CHAIN))
    xups = []
    for d in range(CHAIN):
        xj = sp.joint_transform_revolute(DEPTH_AXES[d], q_legs[..., :, d])
        xt = sp.spatial_transform(jnp.eye(3, dtype=q.dtype),
                                  model.xtree_legs[..., :, d, :])
        xups.append(_mm(xj, xt))
    return jnp.stack(xups, axis=-3)


def _forward_pass(model: FloatingBaseModel, q: jnp.ndarray,
                  dq: jnp.ndarray, v_base: jnp.ndarray) -> _LegKinematics:
    """Featherstone outward sweep (forwardKinematics :469), leg-stacked:
    three sequential depth steps, vectorized over the 4 legs."""
    batch = q.shape[:-1]
    dtype = q.dtype
    dq_legs = dq.reshape(batch + (NUM_LEGS, CHAIN))
    xup = _joint_xforms(model, q)

    v_parent = jnp.broadcast_to(v_base[..., None, :], batch + (NUM_LEGS, 6))
    vs, cs = [], []
    for d in range(CHAIN):
        s = sp.joint_motion_subspace(DEPTH_AXES[d], dtype)
        vj = s * dq_legs[..., :, d, None]
        v_d = _mv(xup[..., d, :, :], v_parent) + vj
        cs.append(sp.motion_cross(v_d, vj))
        vs.append(v_d)
        v_parent = v_d
    return _LegKinematics(xup=xup, v=jnp.stack(vs, axis=-2),
                          c=jnp.stack(cs, axis=-2), v0=v_base)


def mass_matrix(model: FloatingBaseModel, q: jnp.ndarray) -> jnp.ndarray:
    """[..., 18, 18] CRBA (massMatrix :774 / compositeInertias :750).

    Legs only couple through the trunk, so H is
        [[H_bb (6x6),          H_bl (6x12)],
         [H_bl^T,  blockdiag_legs(H_ll 3x3)]]
    assembled from leg-stacked blocks — no scatters, no per-body loops.
    """
    dtype = q.dtype
    batch = q.shape[:-1]
    xup = _joint_xforms(model, q)
    x0, x1, x2 = (xup[..., d, :, :] for d in range(CHAIN))
    i_legs = model.inertia_legs
    eye4 = jnp.eye(NUM_LEGS, dtype=dtype)

    def sandwich(x, ic):
        """X^T ic X (composite inertia transform to the parent frame)."""
        return _mm(jnp.swapaxes(x, -1, -2), _mm(ic, x))

    # Backward composite sweep: knee -> hip -> abad -> trunk.
    ic2 = jnp.broadcast_to(i_legs[..., 2, :, :], batch + (NUM_LEGS, 6, 6))
    ic1 = i_legs[..., 1, :, :] + sandwich(x2, ic2)
    ic0 = i_legs[..., 0, :, :] + sandwich(x1, ic1)
    ic_base = model.inertias[..., 0, :, :] + jnp.sum(sandwich(x0, ic0),
                                                     axis=-3)
    ic_base = jnp.broadcast_to(ic_base, batch + (6, 6))

    # Joint forces f = I_c S per depth (S picks a column: X for abad, Y
    # for hip/knee), then transform down the chain with X^T.
    f2 = ic2[..., :, :, 1]            # [.., 4, 6] (knee, Y axis)
    f1 = ic1[..., :, :, 1]            # hip
    f0 = ic0[..., :, :, 0]            # abad, X axis
    h22 = f2[..., 1]
    f2_h = _mtv(x2, f2)               # knee force in hip frame
    h21 = f2_h[..., 1]
    f2_a = _mtv(x1, f2_h)             # in abad frame
    h20 = f2_a[..., 0]
    f2_b = _mtv(x0, f2_a)             # base coupling column (knee)
    h11 = f1[..., 1]
    f1_a = _mtv(x1, f1)
    h10 = f1_a[..., 0]
    f1_b = _mtv(x0, f1_a)
    h00 = f0[..., 0]
    f0_b = _mtv(x0, f0)

    # Per-leg joint-space 3x3 (symmetric) + base coupling 6x3.
    h_ll = jnp.stack([
        jnp.stack([h00, h10, h20], axis=-1),
        jnp.stack([h10, h11, h21], axis=-1),
        jnp.stack([h20, h21, h22], axis=-1),
    ], axis=-2)                                        # [.., 4, 3, 3]
    h_bl = jnp.stack([f0_b, f1_b, f2_b], axis=-1)      # [.., 4, 6, 3]

    # Assemble: blockdiag over legs via identity einsum; legs side by side
    # for the base coupling rows.
    h_joint = jnp.einsum("...lij,lm->...limj", h_ll, eye4).reshape(
        batch + (12, 12))
    h_bl_full = jnp.swapaxes(h_bl, -3, -2).reshape(batch + (6, 12))
    top = jnp.concatenate([ic_base, h_bl_full], axis=-1)
    bottom = jnp.concatenate([jnp.swapaxes(h_bl_full, -1, -2), h_joint],
                             axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def _bias_force_pass(model: FloatingBaseModel, kin: _LegKinematics,
                     a_base: jnp.ndarray, batch, dtype,
                     with_velocity: bool) -> jnp.ndarray:
    """RNEA with qdd = 0: generalized force for given base acceleration.

    with_velocity=False zeroes velocity-product terms (pure gravity).
    """
    xup = kin.xup
    i_legs = model.inertia_legs
    # Outward acceleration sweep.
    a_parent = jnp.broadcast_to(a_base[..., None, :], batch + (NUM_LEGS, 6))
    a_depth = []
    for d in range(CHAIN):
        a_d = _mv(xup[..., d, :, :], a_parent)
        if with_velocity:
            a_d = a_d + kin.c[..., d, :]
        a_depth.append(a_d)
        a_parent = a_d
    a_legs = jnp.stack(a_depth, axis=-2)               # [.., 4, 3, 6]

    # Link forces f = I a (+ crf(v) I v).
    f_legs = _mv(i_legs, a_legs)
    f0 = _mv(model.inertias[..., 0, :, :], a_base)
    if with_velocity:
        f_legs = f_legs + sp.force_cross(kin.v, _mv(i_legs, kin.v))
        f0 = f0 + sp.force_cross(kin.v0,
                                 _mv(model.inertias[..., 0, :, :], kin.v0))

    # Inward sweep: project onto joint axes, accumulate into parents.
    f_knee = f_legs[..., 2, :]
    tau_knee = f_knee[..., 1]
    f_hip = f_legs[..., 1, :] + _mtv(xup[..., 2, :, :], f_knee)
    tau_hip = f_hip[..., 1]
    f_abad = f_legs[..., 0, :] + _mtv(xup[..., 1, :, :], f_hip)
    tau_abad = f_abad[..., 0]
    f0 = f0 + jnp.sum(_mtv(xup[..., 0, :, :], f_abad), axis=-2)

    tau_legs = jnp.stack([tau_abad, tau_hip, tau_knee],
                         axis=-1).reshape(batch + (12,))
    f0 = jnp.broadcast_to(f0, batch + (6,))
    return jnp.concatenate([f0, tau_legs], axis=-1)


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


def _leg_rotations_positions(model: FloatingBaseModel, state: FbState):
    """Leg-stacked world rotations/joint origins.

    Returns (r_base [..,3,3], rots [..,4,3,3,3], poss [..,4,3,3], kin):
    rots[l, d] is the world rotation of link (l, d); poss[l, d] its joint
    origin in world.
    """
    r_base = se3.quat_to_rotmat(state.quat)
    kin = _forward_pass(model, state.q, state.dq,
                        jnp.concatenate([state.omega_body, state.vel_body],
                                        axis=-1))
    batch = state.q.shape[:-1]
    xtree = jnp.broadcast_to(model.xtree_legs, batch + (NUM_LEGS, CHAIN, 3))
    rot_parent = jnp.broadcast_to(r_base[..., None, :, :],
                                  batch + (NUM_LEGS, 3, 3))
    pos_parent = jnp.broadcast_to(state.position[..., None, :],
                                  batch + (NUM_LEGS, 3))
    rots, poss = [], []
    for d in range(CHAIN):
        pos_d = pos_parent + _mv(rot_parent, xtree[..., :, d, :])
        e = sp.rotation_part(kin.xup[..., d, :, :])   # child_R_parent
        rot_d = _mm(rot_parent, jnp.swapaxes(e, -1, -2))
        rots.append(rot_d)
        poss.append(pos_d)
        rot_parent, pos_parent = rot_d, pos_d
    return (r_base, jnp.stack(rots, axis=-3), jnp.stack(poss, axis=-2), kin)


def _world_rotations_positions(model: FloatingBaseModel, state: FbState):
    """Per-body world rotation + world joint-origin position lists
    (body-indexed compatibility view over the leg-stacked pass)."""
    r_base, rots, poss, kin = _leg_rotations_positions(model, state)
    rot_list = [jnp.broadcast_to(r_base, rots.shape[:-4] + (3, 3))]
    pos_list = [jnp.broadcast_to(state.position, poss.shape[:-3] + (3,))]
    for leg in range(NUM_LEGS):
        for d in range(CHAIN):
            rot_list.append(rots[..., leg, d, :, :])
            pos_list.append(poss[..., leg, d, :])
    return rot_list, pos_list, kin


def foot_positions_world(model: FloatingBaseModel, state: FbState) -> jnp.ndarray:
    """[..., 4, 3] foot (knee contact point) positions in world frame."""
    _, rots, poss, _ = _leg_rotations_positions(model, state)
    return poss[..., :, 2, :] + _mv(rots[..., :, 2, :, :],
                                    model.foot_offset)


def contact_jacobians(model: FloatingBaseModel, state: FbState):
    """World-frame foot Jacobians + bias accelerations.

    Returns (jc [..., 4, 3, 18], jcdqd [..., 4, 3], p_feet [..., 4, 3]).
    Columns follow the generalized-velocity layout
    [omega_body; v_body; qdot]: linear foot velocity in world =
    Jc @ [w_b; v_b; qd]  (contactJacobians :541, biasAccelerations :587).
    """
    r_base, rots, poss, kin = _leg_rotations_positions(model, state)
    batch = state.q.shape[:-1]
    dtype = state.q.dtype
    eye4 = jnp.eye(NUM_LEGS, dtype=dtype)

    p_foot = poss[..., :, 2, :] + _mv(rots[..., :, 2, :, :],
                                      model.foot_offset)   # [.., 4, 3]

    # Base columns: v_foot = R(v_b + w_b x r_rel_body) + joint terms.
    r_rel = _mtv(jnp.broadcast_to(r_base[..., None, :, :],
                                  batch + (NUM_LEGS, 3, 3)),
                 p_foot - state.position[..., None, :])     # body frame
    base_w = -_mm(r_base[..., None, :, :], se3.skew(r_rel))  # [.., 4, 3, 3]
    base_v = jnp.broadcast_to(r_base[..., None, :, :],
                              batch + (NUM_LEGS, 3, 3))

    # Joint columns: axis_world x (p_foot - joint origin) per depth;
    # each leg only fills its own 3 of the 12 joint columns (blockdiag).
    cols = []
    for d in range(CHAIN):
        axis_world = rots[..., :, d, :, DEPTH_AXES[d]]
        cols.append(jnp.cross(axis_world, p_foot - poss[..., :, d, :]))
    cols = jnp.stack(cols, axis=-1)                         # [.., 4, 3, 3]
    joint_cols = jnp.einsum("...lcd,lm->...lcmd", cols, eye4).reshape(
        batch + (NUM_LEGS, 3, 12))
    jc = jnp.concatenate([base_w, base_v, joint_cols], axis=-1)

    # Bias acceleration Jdot qd: velocity-product sweep (qdd = 0), then the
    # classical acceleration of the offset contact point, in world frame.
    a_parent = jnp.zeros(batch + (NUM_LEGS, 6), dtype)
    for d in range(CHAIN):
        a_parent = _mv(kin.xup[..., d, :, :], a_parent) + kin.c[..., d, :]
    a_knee = a_parent
    v_knee = kin.v[..., 2, :]
    w = v_knee[..., 0:3]
    vl = v_knee[..., 3:6]
    aw = a_knee[..., 0:3]
    al = a_knee[..., 3:6]
    r_off = jnp.broadcast_to(model.foot_offset, w.shape)
    a_pt = al + jnp.cross(aw, r_off) + jnp.cross(w, vl + jnp.cross(w, r_off))
    bias = _mv(rots[..., :, 2, :, :], a_pt)
    return jc, bias, p_foot


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
    # Closed-form recursive-Schur SPD inverse (core/linalg, refined):
    # jnp.linalg.solve takes XLA's batched LU, which is pathologically
    # slow inside vmapped tick scans on TPU (measured on the SRB rollout;
    # the whole-body sim calls this every tick).
    return jnp.einsum("...ij,...j->...i", linalg.inv_spd(h, refine=2), rhs)
