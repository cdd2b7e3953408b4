"""Model / Data pytrees — the TPU-native analogue of mujoco-py's MjModel/MjData.

The reference framework wraps a mutable C struct pair (MjModel, MjData) behind
`SimulationInterface` (/root/reference/robogym/mujoco/simulation_interface.py:25-250).
Here the same information is split into two immutable pytrees:

  * `Model`  — quantities fixed for an episode (masses, joint layout, geoms,
    actuator gains, solver params...). Field names follow MuJoCo's naming so
    the randomization framework can address the same fields
    (/root/reference/robogym/randomization/sim.py:28-589 mutates e.g.
    `model.geom_solimp`, `model.dof_damping`, `model.opt.gravity`).
    Model arrays are *traced* jnp arrays: per-reset domain randomization is a
    pure `Model -> Model` transform and can differ per env in a batch without
    recompilation (a `vmap`-ed Model axis).
  * `Data`   — the per-step state (qpos, qvel, actuator internal state,
    mocap pose) plus derived quantities produced by `forward()`.

Structural integer tables (parent indices, dof addresses...) are stored as
static numpy arrays in `Model.const` — they define array shapes / gather
patterns and therefore must be compile-time constants under `jit`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Enums (values match MuJoCo where a counterpart exists)
# ---------------------------------------------------------------------------


class JointType:
    FREE = 0
    BALL = 1
    SLIDE = 2
    HINGE = 3

    # qpos widths / dof widths per type
    QPOS_WIDTH = {FREE: 7, BALL: 4, SLIDE: 1, HINGE: 1}
    DOF_WIDTH = {FREE: 6, BALL: 3, SLIDE: 1, HINGE: 1}


class GeomType:
    PLANE = 0
    SPHERE = 2
    CAPSULE = 3
    ELLIPSOID = 4
    CYLINDER = 5
    BOX = 6
    MESH = 7


class TrnType:
    JOINT = 0
    TENDON = 3
    SITE = 4


class GainType:
    FIXED = 0
    USER = 2  # mujoco-py PID / cascaded-PI controller


class BiasType:
    NONE = 0
    AFFINE = 1
    USER = 2


class EqType:
    # mirrors robogym.mujoco.constants.MujocoEquality (constants.py:55-61)
    CONNECT = 0
    WELD = 1
    JOINT = 2
    TENDON = 3
    DISTANCE = 4


class WrapType:
    JOINT = 1       # fixed tendon element
    PULLEY = 2
    SITE = 3
    SPHERE = 4      # wrapping geom


class ConeType:
    PYRAMIDAL = 0
    ELLIPTIC = 1


class IntegratorType:
    EULER = 0
    RK4 = 1


class DynType:
    NONE = 0
    INTEGRATOR = 1
    FILTER = 2


# ---------------------------------------------------------------------------
# Static (compile-time) structural tables
# ---------------------------------------------------------------------------


class _FrozenNP:
    """Read-only numpy array wrapper, hashable so it can live in pytree aux."""

    __slots__ = ("arr", "_hash")

    def __init__(self, arr: np.ndarray):
        a = np.asarray(arr)
        a.setflags(write=False)
        self.arr = a
        self._hash = hash((a.shape, str(a.dtype), a.tobytes()))

    def __hash__(self):
        return self._hash

    def __eq__(self, other):
        return (
            isinstance(other, _FrozenNP)
            and self.arr.shape == other.arr.shape
            and self.arr.dtype == other.arr.dtype
            and np.array_equal(self.arr, other.arr)
        )


@dataclasses.dataclass(frozen=True, eq=False)
class ModelConst:
    """Static structural description of the kinematic tree.

    Everything here is host-side numpy, identical for every env in a batch,
    and hashable (participates in jit cache keys via pytree aux data).
    """

    # sizes
    nq: int
    nv: int
    nu: int
    na: int            # actuator internal state width (PID integrators...)
    nbody: int
    njnt: int
    ngeom: int
    nsite: int
    nmesh: int
    ntendon: int
    nwrap: int
    neq: int
    nmocap: int
    nsensor: int

    # bodies
    body_parentid: np.ndarray      # (nbody,)
    body_rootid: np.ndarray        # (nbody,)
    body_weldid: np.ndarray        # (nbody,) body welded-to group id (no joint between)
    body_jntadr: np.ndarray        # (nbody,)
    body_jntnum: np.ndarray
    body_dofadr: np.ndarray
    body_dofnum: np.ndarray
    body_mocapid: np.ndarray       # (nbody,) -1 if not mocap
    body_tree: Tuple[Tuple[int, ...], ...]   # bodies grouped by tree depth (excl. world)

    # joints
    jnt_type: np.ndarray           # (njnt,)
    jnt_qposadr: np.ndarray
    jnt_dofadr: np.ndarray
    jnt_bodyid: np.ndarray
    jnt_limited: np.ndarray        # (njnt,) bool

    # dofs
    dof_jntid: np.ndarray          # (nv,)
    dof_bodyid: np.ndarray         # (nv,)
    dof_parentid: np.ndarray       # (nv,) parent dof or -1

    # geoms
    geom_type: np.ndarray          # (ngeom,)
    geom_bodyid: np.ndarray
    geom_dataid: np.ndarray        # (ngeom,) mesh id or -1
    geom_contype: np.ndarray
    geom_conaffinity: np.ndarray
    geom_condim: np.ndarray

    # sites
    site_bodyid: np.ndarray

    # tendons (wrap arrays cover both fixed and spatial tendons)
    tendon_adr: np.ndarray         # (ntendon,) first wrap element
    tendon_num: np.ndarray         # (ntendon,) number of wrap elements
    tendon_limited: np.ndarray     # (ntendon,) bool
    wrap_type: np.ndarray          # (nwrap,)
    wrap_objid: np.ndarray         # (nwrap,) joint/site/geom id

    # actuators
    actuator_trntype: np.ndarray   # (nu,)
    actuator_trnid: np.ndarray     # (nu,) joint or tendon id
    actuator_gaintype: np.ndarray
    actuator_biastype: np.ndarray
    actuator_dyntype: np.ndarray
    actuator_actadr: np.ndarray    # (nu,) index into act state or -1
    actuator_user: np.ndarray      # (nu,) user[0]: 1 -> cascaded PI (mjpid.pyx)
    actuator_ctrllimited: np.ndarray
    actuator_forcelimited: np.ndarray

    # equality constraints
    eq_type: np.ndarray            # (neq,)
    eq_obj1id: np.ndarray
    eq_obj2id: np.ndarray

    # precomputed collision pair table: (npair, 2) geom ids
    collision_pairs: np.ndarray
    # max contacts points allocated per pair (same length)
    pair_ncon: np.ndarray

    # (nbody, nv) 1.0 where dof i moves body b (dof's joint is on b or an
    # ancestor of b). Lets CRB/RNE/Jacobians be batched matmuls instead of
    # tree walks: M = sum_b (mask_b * cdof)^T I_b (mask_b * cdof).
    body_dof_mask: np.ndarray = None
    # (nv,) static: dof has a friction-loss constraint row
    dof_has_frictionloss: np.ndarray = None

    # cameras (render/raycast.py)
    ncam: int = 0
    cam_bodyid: np.ndarray = None  # (ncam,)
    nlight: int = 0
    light_bodyid: np.ndarray = None       # (nlight,)
    light_directional: np.ndarray = None  # (nlight,) bool

    # name tables (host-side lookups, analogue of mj_name2id)
    names: Dict[str, Dict[str, int]] = dataclasses.field(default_factory=dict)

    def __post_init__(self):
        for f in dataclasses.fields(self):
            v = getattr(self, f.name)
            if isinstance(v, np.ndarray):
                v.setflags(write=False)

    def __hash__(self):
        return hash((self.nq, self.nv, self.nu, self.nbody, self.ngeom,
                     self.ntendon, self.neq,
                     self.body_parentid.tobytes(), self.jnt_type.tobytes(),
                     self.geom_type.tobytes(), self.collision_pairs.tobytes()))

    def __eq__(self, other):
        if not isinstance(other, ModelConst):
            return False
        for f in dataclasses.fields(self):
            a, b = getattr(self, f.name), getattr(other, f.name)
            if isinstance(a, np.ndarray):
                if not np.array_equal(a, b):
                    return False
            elif a != b:
                return False
        return True

    # -- name lookups -----------------------------------------------------
    def name2id(self, kind: str, name: str) -> int:
        return self.names[kind][name]

    def joint_qposadr(self, name: str) -> int:
        jid = self.names["joint"][name]
        return int(self.jnt_qposadr[jid])

    def joint_dofadr(self, name: str) -> int:
        jid = self.names["joint"][name]
        return int(self.jnt_dofadr[jid])


class _Replaceable:
    def replace(self, **kwargs):
        return dataclasses.replace(self, **kwargs)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Option(_Replaceable):
    """Physics options (a subset of mjOption; reference OPT_FIELDS
    /root/reference/robogym/mujoco/constants.py:3-31)."""

    timestep: jax.Array        # ()
    gravity: jax.Array         # (3,)
    wind: jax.Array            # (3,)
    density: jax.Array         # ()
    viscosity: jax.Array       # ()
    impratio: jax.Array        # ()
    # static solver config
    iterations: int = dataclasses.field(metadata=dict(static=True), default=20)
    # iteration budget for the CG solver (a different solver from MuJoCo's
    # Newton, so the XML `iterations` attr does not transfer): 15 iterations
    # with the frozen-active-set Newton line search match the former
    # 20-iteration grid-search solve on the conformance suite
    cg_iterations: int = dataclasses.field(metadata=dict(static=True), default=15)
    ls_iterations: int = dataclasses.field(metadata=dict(static=True), default=8)
    # active-contact budget: the constraint assembler gathers the
    # `ncon_active` deepest contact slots before building Jacobians (the
    # fixed-size analogue of MuJoCo's nconmax, cube_env.py:229-243)
    ncon_active: int = dataclasses.field(metadata=dict(static=True), default=32)
    # broadphase active-PAIR budget per narrowphase group (lax.top_k size in
    # collision/driver.py). Dense multi-object scenes (20-domino holdouts)
    # need more resting pairs than the hand worlds the default is tuned for.
    group_cap: int = dataclasses.field(metadata=dict(static=True), default=48)
    # constraint solver: "newton" (per-iteration Hessian Cholesky) or "cg"
    # (preconditioned nonlinear CG, MuJoCo mjSOL_CG analogue - the fast path
    # on TPU where batched small Choleskys are slow)
    solver: str = dataclasses.field(metadata=dict(static=True), default="cg")
    tolerance: float = dataclasses.field(metadata=dict(static=True), default=1e-8)
    cone: int = dataclasses.field(metadata=dict(static=True), default=ConeType.PYRAMIDAL)
    integrator: int = dataclasses.field(metadata=dict(static=True), default=IntegratorType.EULER)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Model(_Replaceable):
    """Episode-constant physical model. All array fields are traced jnp arrays
    (so they can be randomized per reset / per env); `const` is static."""

    const: ModelConst = dataclasses.field(metadata=dict(static=True))
    opt: Option

    # reference configuration (jnt ref / free-body world pose at compile)
    qpos0: jax.Array           # (nq,)

    # bodies
    body_pos: jax.Array        # (nbody, 3)
    body_quat: jax.Array       # (nbody, 4)
    body_ipos: jax.Array       # (nbody, 3)
    body_iquat: jax.Array      # (nbody, 4)
    body_mass: jax.Array       # (nbody,)
    body_inertia: jax.Array    # (nbody, 3)

    # joints
    jnt_pos: jax.Array         # (njnt, 3)
    jnt_axis: jax.Array        # (njnt, 3)
    jnt_range: jax.Array       # (njnt, 2)
    jnt_margin: jax.Array      # (njnt,)
    jnt_stiffness: jax.Array   # (njnt,)
    jnt_springref: jax.Array   # (njnt,) spring reference (qpos units, ref/springref)
    jnt_solref: jax.Array      # (njnt, 2)
    jnt_solimp: jax.Array      # (njnt, 5)

    # dofs
    dof_armature: jax.Array    # (nv,)
    dof_damping: jax.Array     # (nv,)
    dof_frictionloss: jax.Array  # (nv,)
    dof_solref: jax.Array      # (nv, 2) friction loss solref
    dof_solimp: jax.Array      # (nv, 5)

    # geoms
    geom_pos: jax.Array        # (ngeom, 3)
    geom_quat: jax.Array       # (ngeom, 4)
    geom_size: jax.Array       # (ngeom, 3)
    geom_friction: jax.Array   # (ngeom, 3) slide, torsion, roll
    geom_solref: jax.Array     # (ngeom, 2)
    geom_solimp: jax.Array     # (ngeom, 5)
    geom_solmix: jax.Array     # (ngeom,)
    geom_margin: jax.Array     # (ngeom,)
    geom_gap: jax.Array        # (ngeom,)
    geom_priority: jax.Array   # (ngeom,)
    geom_rgba: jax.Array       # (ngeom, 4)

    # sites
    site_pos: jax.Array        # (nsite, 3)
    site_quat: jax.Array       # (nsite, 4)

    # meshes: padded convex hulls for collision (nmesh, MAXV, 3) + valid mask
    mesh_convex_vert: jax.Array    # (nmesh, MAXV, 3)
    mesh_convex_mask: jax.Array    # (nmesh, MAXV) 1.0 valid
    mesh_convex_center: jax.Array  # (nmesh, 3)

    # tendons
    tendon_range: jax.Array        # (ntendon, 2)
    tendon_stiffness: jax.Array    # (ntendon,)
    tendon_damping: jax.Array      # (ntendon,)
    tendon_lengthspring: jax.Array  # (ntendon,)
    tendon_margin: jax.Array       # (ntendon,)
    tendon_solref: jax.Array       # (ntendon, 2)
    tendon_solimp: jax.Array       # (ntendon, 5)
    tendon_frictionloss: jax.Array  # (ntendon,)
    wrap_prm: jax.Array            # (nwrap,) joint coef / pulley divisor

    # actuators
    actuator_gainprm: jax.Array    # (nu, 10) mjNGAIN
    actuator_biasprm: jax.Array    # (nu, 10) mjNBIAS
    actuator_dynprm: jax.Array     # (nu, 3)
    actuator_ctrlrange: jax.Array  # (nu, 2)
    actuator_forcerange: jax.Array  # (nu, 2)
    actuator_gear: jax.Array       # (nu, 6)

    # equality
    eq_active: jax.Array       # (neq,)
    eq_data: jax.Array         # (neq, 11)
    eq_solref: jax.Array       # (neq, 2)
    eq_solimp: jax.Array       # (neq, 5)

    # cameras (fixed-mode <camera> elements; reference renders them via
    # OpenGL offscreen — here render/raycast.py consumes these directly on
    # device). Traced so camera pose/fov can be domain-randomized per env.
    cam_pos: Optional[jax.Array] = None    # (ncam, 3) local to parent body
    cam_quat: Optional[jax.Array] = None   # (ncam, 4)
    cam_fovy: Optional[jax.Array] = None   # (ncam,) vertical fov, degrees

    # lights (<light> elements) + the camera headlight — all traced so the
    # vision DR path (randomization/vision.py, reference rearrange
    # common/base.py:637-730) can jitter them per episode via model_fields
    light_pos: Optional[jax.Array] = None      # (nlight, 3) parent frame
    light_dir: Optional[jax.Array] = None      # (nlight, 3)
    light_ambient: Optional[jax.Array] = None  # (nlight,) scalar intensity
    light_diffuse: Optional[jax.Array] = None  # (nlight,)
    light_active: Optional[jax.Array] = None   # (nlight,) 1.0 = on
    headlight_diffuse: Optional[jax.Array] = None  # () scalar
    headlight_ambient: Optional[jax.Array] = None  # () scalar

    # mesh convex-hull FACE planes for raycast rendering: a point x (mesh
    # local frame) is inside iff n.x + off <= 0 for all valid faces.
    # Parallel to mesh_convex_vert so per-episode hull-bank swaps
    # (envs/rearrange/mesh.py) can swap these too.
    mesh_face_plane: Optional[jax.Array] = None  # (nmesh, MAXF, 4) [n|off]
    mesh_face_mask: Optional[jax.Array] = None   # (nmesh, MAXF) 1.0 valid

    # explicit contact pair overrides could be added here later

    @property
    def nq(self) -> int:
        return self.const.nq

    @property
    def nv(self) -> int:
        return self.const.nv

    @property
    def nu(self) -> int:
        return self.const.nu

    @property
    def nbody(self) -> int:
        return self.const.nbody


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Contact(_Replaceable):
    """Batched fixed-size contact set produced by the collision pipeline.

    Solver parameters (solref/solimp/friction) are stored per broadphase
    WINNER row in `wtab`, not per slot: a winner emits `ncon`-per-pair
    slots that all share its parameters, and materializing the 12 repeated
    columns per slot per substep was pure HBM traffic (the slot:winner
    ratio is ~5x on the dactyl worlds). The static slot->winner map lives
    in `collision.driver.slot_winner_rows(const, group_cap)`; per-slot
    expansions for diagnostics go through
    `collision.driver.contact_full_params` / `contact_frame`."""

    dist: jax.Array        # (ncon,)
    pos: jax.Array         # (ncon, 3)
    normal: jax.Array      # (ncon, 3) frame row 0; tangents are derived
    #                        deterministically from it (driver._orthogonal)
    includemargin: jax.Array  # (ncon,)
    geom1: jax.Array       # (ncon,) int32 (static pair table, same for all envs)
    geom2: jax.Array       # (ncon,)
    active: jax.Array      # (ncon,) bool — dist < includemargin
    condim: jax.Array      # (ncon,) int32 contact dimensionality per slot
    body1: jax.Array       # (ncon,) int32 geom_bodyid[geom1] (emitted by the
    body2: jax.Array       # (ncon,) int32  driver so the constraint prelude
    #                        needs no per-env body-id gather)
    wtab: jax.Array        # (W, 12) per-winner [solref(2) solimp(5) fric5(5)]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Data(_Replaceable):
    """Per-step simulation state + derived quantities (MjData analogue).

    `make_data(model)` builds the initial value; `physics.forward` fills the
    derived fields; `physics.step` advances (qpos, qvel, act, time).
    """

    # state
    time: jax.Array        # ()
    qpos: jax.Array        # (nq,)
    qvel: jax.Array        # (nv,)
    act: jax.Array         # (na,) actuator internal state (PID integrators &c)
    ctrl: jax.Array        # (nu,)
    qfrc_applied: jax.Array  # (nv,)
    xfrc_applied: jax.Array  # (nbody, 6) body cartesian wrench
    mocap_pos: jax.Array   # (nmocap, 3)
    mocap_quat: jax.Array  # (nmocap, 4)

    # derived: kinematics
    xpos: jax.Array        # (nbody, 3)
    xquat: jax.Array       # (nbody, 4)
    xmat: jax.Array        # (nbody, 3, 3)
    xipos: jax.Array       # (nbody, 3)
    ximat: jax.Array       # (nbody, 3, 3)
    geom_xpos: jax.Array   # (ngeom, 3)
    geom_xmat: jax.Array   # (ngeom, 3, 3)
    site_xpos: jax.Array   # (nsite, 3)
    site_xmat: jax.Array   # (nsite, 3, 3)

    # derived: com-based quantities
    subtree_com: jax.Array  # (nbody, 3)
    cdof: jax.Array        # (nv, 6) dof motion axes in com frame (ang, lin)
    cinert: jax.Array      # (nbody, 6, 6) spatial inertia in root-com frame
    cvel: jax.Array        # (nbody, 6) com-frame body velocity

    # derived: dynamics
    qM: jax.Array          # (nv, nv) dense mass matrix
    qLD: jax.Array         # (nv, nv) placeholder (hot path uses explicit M^-1)
    qfrc_bias: jax.Array   # (nv,)
    qfrc_passive: jax.Array  # (nv,)
    qfrc_actuator: jax.Array  # (nv,)
    actuator_length: jax.Array  # (nu,)
    actuator_velocity: jax.Array  # (nu,)
    actuator_force: jax.Array   # (nu,)
    ten_length: jax.Array  # (ntendon,)
    ten_velocity: jax.Array  # (ntendon,)
    ten_J: jax.Array       # (ntendon, nv)
    act_dot: jax.Array     # (na,)
    # d(actuator force)/d(qvel) diagonal (negated): per-dof velocity-feedback
    # damping from user-gain controllers, folded into the implicit Euler
    # solve for stability (velocity loops like the UR16e cascaded-PI's
    # Kvp=70 are explicitly unstable at dt=1ms on low-inertia wrist dofs)
    act_vel_damping: jax.Array  # (nv,)

    # contacts & constraint solution
    contact: Contact
    qacc_smooth: jax.Array  # (nv,)
    qacc: jax.Array        # (nv,)
    qfrc_constraint: jax.Array  # (nv,)
    efc_force_contact: jax.Array  # (ncon_total,) normal force per contact row


def make_data(model: Model, dtype=jnp.float32, qpos0: Optional[np.ndarray] = None) -> Data:
    """Initial Data for a model (analogue of mj_makeData + qpos0)."""
    c = model.const
    nq, nv, nu, na = c.nq, c.nv, c.nu, c.na
    if c.collision_pairs.size:
        from robogym_tpu.physics.collision import driver as _driver

        ncon = _driver.n_contact_slots(c, model.opt.group_cap)
        nwin = _driver.n_winner_rows(c, model.opt.group_cap)
    else:
        ncon = 0
        nwin = 0

    if qpos0 is None:
        qpos0 = np.asarray(model.qpos0, dtype=np.float64)

    z = lambda *s: jnp.zeros(s, dtype)
    ident_quat = jnp.tile(jnp.asarray([1.0, 0, 0, 0], dtype), (c.nbody, 1))
    eye3 = jnp.tile(jnp.eye(3, dtype=dtype), (c.nbody, 1, 1))

    contact = Contact(
        dist=z(ncon), pos=z(ncon, 3),
        normal=jnp.tile(jnp.asarray([1.0, 0, 0], dtype), (ncon, 1)),
        includemargin=z(ncon),
        geom1=jnp.zeros(ncon, jnp.int32), geom2=jnp.zeros(ncon, jnp.int32),
        active=jnp.zeros(ncon, bool),
        condim=jnp.full(ncon, 3, jnp.int32),
        body1=jnp.zeros(ncon, jnp.int32), body2=jnp.zeros(ncon, jnp.int32),
        wtab=z(nwin, 12),
    )

    return Data(
        time=jnp.asarray(0.0, dtype),
        qpos=jnp.asarray(qpos0, dtype),
        qvel=z(nv), act=z(na), ctrl=z(nu),
        qfrc_applied=z(nv), xfrc_applied=z(c.nbody, 6),
        mocap_pos=z(c.nmocap, 3),
        mocap_quat=jnp.tile(jnp.asarray([1.0, 0, 0, 0], dtype), (max(c.nmocap, 0), 1)).reshape(c.nmocap, 4),
        xpos=z(c.nbody, 3), xquat=ident_quat, xmat=eye3,
        xipos=z(c.nbody, 3), ximat=eye3,
        geom_xpos=z(c.ngeom, 3), geom_xmat=jnp.tile(jnp.eye(3, dtype=dtype), (c.ngeom, 1, 1)),
        site_xpos=z(c.nsite, 3), site_xmat=jnp.tile(jnp.eye(3, dtype=dtype), (c.nsite, 1, 1)),
        subtree_com=z(c.nbody, 3), cdof=z(nv, 6), cinert=z(c.nbody, 6, 6),
        cvel=z(c.nbody, 6),
        qM=z(nv, nv), qLD=z(nv, nv),
        qfrc_bias=z(nv), qfrc_passive=z(nv), qfrc_actuator=z(nv),
        actuator_length=z(nu), actuator_velocity=z(nu), actuator_force=z(nu),
        ten_length=z(c.ntendon), ten_velocity=z(c.ntendon), ten_J=z(c.ntendon, nv),
        act_dot=z(na), act_vel_damping=z(nv),
        contact=contact,
        qacc_smooth=z(nv), qacc=z(nv), qfrc_constraint=z(nv),
        efc_force_contact=z(ncon),
    )
