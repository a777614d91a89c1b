"""Scene: entities (transform + mesh), lights, per-frame derived arrays.

TPU-first equivalent of src/scene.rs: the CPU entity list becomes static
host-side numpy (SceneBuilder); per-frame GPU buffers (GpuEntityData /
GpuLightData, scene.rs:120-133, 278-291) become the SceneArrays pytree of
fixed-capacity device arrays. Transforms can be animated on device by
rebuilding model matrices from TRS arrays inside the jitted frame.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

LIGHT_SKY = 0
LIGHT_DIRECTIONAL = 1
LIGHT_POINT = 2

MAX_LIGHTS_DEFAULT = 2048  # reference scene.rs:304


@jax.tree_util.register_dataclass
@dataclass
class SceneArrays:
    """Device scene state (capacities static).

    entity_model:      [E,4,4] f32 model matrices
    entity_normal_mat: [E,3,3] f32 inverse-transpose 3x3
    entity_mesh:       [E] i32 mesh id (-1 = empty slot)
    light_type:        [L] i32 (sky/directional/point)
    light_pos:         [L,3] position (point) or unused
    light_dir:         [L,3] direction TOWARDS the light (directional)
    light_color:       [L,3] color * intensity premultiplied
    light_intensity:   [L]
    light_inner_radius:[L] (point: min distance; directional: angular size
                        for PCSS penumbrae — reference LightData)
    light_outer_radius:[L] cutoff radius for clustering
    """

    entity_model: jax.Array
    entity_normal_mat: jax.Array
    entity_mesh: jax.Array
    light_type: jax.Array
    light_pos: jax.Array
    light_dir: jax.Array
    light_color: jax.Array
    light_intensity: jax.Array
    light_inner_radius: jax.Array
    light_outer_radius: jax.Array


@dataclass(frozen=True)
class SceneMeta:
    num_entities: int = 0
    num_lights: int = 0
    entity_capacity: int = 0
    light_capacity: int = 0
    light_types: tuple = ()  # host-side copy for trace-time branching
    # host copy of entity->mesh mapping: avoids device readbacks (which
    # poison dispatch latency on tunneled TPUs) in pipeline/instance setup
    entity_mesh_host: tuple = ()


def _compose_trs_np(t, q, s):
    """Host numpy TRS (device readbacks in setup code poison dispatch
    latency on tunneled TPUs — scene building must stay on the CPU)."""
    x, y, z, w = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    x2, y2, z2 = x + x, y + y, z + z
    xx, yy, zz = x * x2, y * y2, z * z2
    xy, xz, yz = x * y2, x * z2, y * z2
    wx, wy, wz = w * x2, w * y2, w * z2
    r = np.empty((len(q), 3, 3), np.float32)
    r[:, 0, 0] = 1 - (yy + zz); r[:, 0, 1] = xy - wz; r[:, 0, 2] = xz + wy
    r[:, 1, 0] = xy + wz; r[:, 1, 1] = 1 - (xx + zz); r[:, 1, 2] = yz - wx
    r[:, 2, 0] = xz - wy; r[:, 2, 1] = yz + wx; r[:, 2, 2] = 1 - (xx + yy)
    m = np.tile(np.eye(4, dtype=np.float32), (len(q), 1, 1))
    m[:, :3, :3] = r * s[:, None, :]
    m[:, :3, 3] = t
    return m


class SceneBuilder:
    """Host-side scene assembly (reference: SceneData::add_entity)."""

    def __init__(self, entity_capacity: int = 1024, light_capacity: int = 256):
        self.entity_capacity = entity_capacity
        self.light_capacity = light_capacity
        self.translations = []
        self.rotations = []  # quaternion (x,y,z,w)
        self.scales = []
        self.meshes = []
        self.matrices = []  # explicit 4x4 overrides (glTF nodes) or None
        self.lights = []

    def add_entity(
        self, mesh: int, translation=(0, 0, 0), rotation=(0, 0, 0, 1), scale=1.0
    ) -> int:
        if np.isscalar(scale):
            scale = (scale, scale, scale)
        self.translations.append(np.asarray(translation, np.float32))
        self.rotations.append(np.asarray(rotation, np.float32))
        self.scales.append(np.asarray(scale, np.float32))
        self.meshes.append(mesh)
        self.matrices.append(None)
        return len(self.meshes) - 1

    def add_entity_matrix(self, mesh: int, matrix: np.ndarray) -> int:
        """Entity with an explicit 4x4 model matrix (glTF node import)."""
        self.translations.append(np.zeros(3, np.float32))
        self.rotations.append(np.array([0, 0, 0, 1], np.float32))
        self.scales.append(np.ones(3, np.float32))
        self.meshes.append(mesh)
        self.matrices.append(np.asarray(matrix, np.float32))
        return len(self.meshes) - 1

    def add_light(
        self,
        kind: int,
        position=(0, 0, 0),
        direction=(0, 1, 0),
        color=(1, 1, 1),
        intensity: float = 1.0,
        inner_radius: float = 0.1,
        outer_radius: float = 8.0,
    ) -> int:
        d = np.asarray(direction, np.float32)
        d = d / max(np.linalg.norm(d), 1e-12)
        self.lights.append(
            dict(
                kind=kind,
                position=np.asarray(position, np.float32),
                direction=d,
                color=np.asarray(color, np.float32),
                intensity=float(intensity),
                inner_radius=float(inner_radius),
                outer_radius=float(outer_radius),
            )
        )
        return len(self.lights) - 1

    def to_device(self, device=None):
        E, L = self.entity_capacity, self.light_capacity
        ne, nl = len(self.meshes), len(self.lights)
        assert ne <= E and nl <= L

        model = np.tile(np.eye(4, dtype=np.float32), (E, 1, 1))
        if ne:
            t = np.stack(self.translations)
            r = np.stack(self.rotations)
            s = np.stack(self.scales)
            model[:ne] = _compose_trs_np(t, r, s)
            for i, m in enumerate(self.matrices):
                if m is not None:
                    model[i] = m
        normal_mat = np.linalg.inv(model[:, :3, :3]).transpose(0, 2, 1)

        mesh = np.full(E, -1, np.int32)
        mesh[:ne] = np.asarray(self.meshes, np.int32)

        lt = np.zeros(L, np.int32)
        lp = np.zeros((L, 3), np.float32)
        ld = np.tile(np.array([0, 1, 0], np.float32), (L, 1))
        lc = np.zeros((L, 3), np.float32)
        li = np.zeros(L, np.float32)
        lir = np.full(L, 0.1, np.float32)
        lor = np.full(L, 1.0, np.float32)
        for i, l in enumerate(self.lights):
            lt[i] = l["kind"]
            lp[i] = l["position"]
            ld[i] = l["direction"]
            lc[i] = l["color"] * l["intensity"]
            li[i] = l["intensity"]
            lir[i] = l["inner_radius"]
            lor[i] = l["outer_radius"]

        put = lambda x: jax.device_put(x, device)
        arrays = SceneArrays(
            entity_model=put(model),
            entity_normal_mat=put(normal_mat.astype(np.float32)),
            entity_mesh=put(mesh),
            light_type=put(lt),
            light_pos=put(lp),
            light_dir=put(ld),
            light_color=put(lc),
            light_intensity=put(li),
            light_inner_radius=put(lir),
            light_outer_radius=put(lor),
        )
        meta = SceneMeta(
            num_entities=ne,
            num_lights=nl,
            entity_capacity=E,
            light_capacity=L,
            light_types=tuple(int(l["kind"]) for l in self.lights),
            entity_mesh_host=tuple(int(m) for m in mesh),
        )
        return arrays, meta
