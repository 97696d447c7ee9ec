"""CAD-template matching: the "guessed" particle birth subsystem.

TPU-native re-design of the reference's template machinery
(pointcloud_tools.h:318-1097, used by semantic_dsp_map.h:616-669 and
:806-894):

  - ``findBestTemplateTransformationPHD`` / ``...FSConsidered``: sweep 36 yaw
    angles x 3x3 translation jitters of a template cloud against a voxelized
    source cloud; score = (unique source-occupied voxels hit) minus, in the
    FS variant, (unique observed-free voxels hit), normalized by the source's
    occupied-voxel count (pointcloud_tools.h:686-865, 874-1097).
  - ``alignTemplatesToPointCloud``: best template of a label by that score
    (pointcloud_tools.h:333-360).
  - ``alignPointCloudToSource``: re-align an object's own particles to its
    observed cloud (non-FS scoring, pointcloud_tools.h:318-324).

The reference's serial 36x9 loop over dynamically-sized voxel grids becomes
one jitted program over a static match grid: all 324 hypotheses are evaluated
as a batched rotate->snap->scatter->intersect, with the per-hypothesis
"unique voxel" dedup done by scatter-OR into per-hypothesis bitmaps.

Deliberate deviation (documented): the FS variant's free-space ray casting in
the reference interleaves "mark occupied" and "cast ray" per point, so whether
a ray is blocked depends on source-point order.  Here rays are blocked by the
*complete* occupied set (order-independent, slightly fewer free voxels).  The
reference's behavior is unreproducible without serializing; ours is the
deterministic fixed point.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

#: Match-grid voxel size (pointcloud_tools.h:740 / :928: voxel_size = 0.2f).
TM_VOXEL_SIZE = 0.2

#: FS-variant grid expansion in voxels per side (pointcloud_tools.h:935).
TM_EXPAND = 10

#: The template is pushed 10 m past the closest point before snapping
#: (pointcloud_tools.h:774: "the object's half size is no more than 10").
TM_PUSH_DISTANCE = 10.0

#: Yaw sweep: 0..350 degrees step 10 (pointcloud_tools.h:771).
TM_NUM_ANGLES = 36

#: Translation jitter offsets in grid voxels (pointcloud_tools.h:806).
TM_NOISE_RANGE = 1

#: Gaussian noise sigma for guessed-particle birth (semantic_dsp_map.h:884).
GUESSED_BIRTH_NOISE = 0.01

#: Guessed particles per aligned template point (semantic_dsp_map.h:880).
GUESSED_BIRTH_COPIES = 3

#: Particle weight for re-matched particles (operations.h:136).
MATCHED_WEIGHT = 0.2

#: Eligibility for template birth (semantic_dsp_map.h:820-828): Car-labeled,
#: point count in (1500, 8000), bbox x/y extents >= 1 m.
TM_MIN_POINTS = 1500
TM_MAX_POINTS = 8000
TM_MIN_BBOX_XY = 1.0

#: Rematch path needs >= 100 observed points (semantic_dsp_map.h:641-643).
REMATCH_MIN_POINTS = 100


@dataclasses.dataclass(frozen=True)
class MatchGridConfig:
    """Static shape of the match grid.  The reference sizes its grid to the
    source bbox at runtime; a static grid anchored at (bbox_min - expand) and
    large enough for any eligible object keeps the program shape-stable.
    64 voxels/axis @ 0.2 m = 12.8 m span, >= any <=8 m vehicle + 2 m slack +
    the FS expansion."""

    grid_n: int = 64
    max_source_points: int = 8192
    max_template_points: int = 4096
    fs_ray_steps: int = 192  # 38.4 m of ray @ 0.2 m steps

    @property
    def num_cells(self) -> int:
        return self.grid_n ** 3


class MatchResult(NamedTuple):
    score: jax.Array     # f32: biggest_intersection / occupied_voxel_count
    tmatrix: jax.Array   # f32[4, 4] template -> world
    aligned: jax.Array   # f32[P, 3] transformed template points


def center_cloud(pts: np.ndarray) -> np.ndarray:
    """alignPointCloudToXYZCenter (pointcloud_tools.h:365-380): subtract the
    min/max range center per axis."""
    c = (pts.min(axis=0) + pts.max(axis=0)) * 0.5
    return pts - c


@dataclasses.dataclass
class TemplateBank:
    """Padded CAD templates grouped by label id (the reference's
    ``existing_point_cloud_templates_map_``, pointcloud_tools.h:482)."""

    pts: np.ndarray       # f32[T, P, 3] centered template points
    valid: np.ndarray     # bool[T, P]
    label: np.ndarray     # i32[T]

    @staticmethod
    def from_folder(folder: str, cfg: MatchGridConfig) -> "TemplateBank":
        """setTemplatePath + readExistingPointCloudTemplates
        (pointcloud_tools.h:382-420): each .pcd's label id is its parent
        directory name.  Templates are centered on load (the reference centers
        lazily in alignPointCloudToXYZCenter; its stored templates are assumed
        pre-centered CAD models — we center unconditionally, a superset)."""
        from ..io import read_template_folder

        tpls = read_template_folder(folder)
        return TemplateBank.from_dict(tpls, cfg)

    @staticmethod
    def from_dict(tpls: Dict[int, List[np.ndarray]], cfg: MatchGridConfig) -> "TemplateBank":
        P = cfg.max_template_points
        rows, valids, labels = [], [], []
        for label_id in sorted(tpls):
            for cloud in tpls[label_id]:
                cloud = center_cloud(np.asarray(cloud, np.float32))
                if cloud.shape[0] > P:
                    # Deterministic stride subsample to the static capacity.
                    idx = np.linspace(0, cloud.shape[0] - 1, P).astype(np.int64)
                    cloud = cloud[idx]
                pad = np.zeros((P, 3), np.float32)
                pad[: cloud.shape[0]] = cloud
                v = np.zeros(P, bool)
                v[: cloud.shape[0]] = True
                rows.append(pad)
                valids.append(v)
                labels.append(label_id)
        if not rows:
            rows = [np.zeros((P, 3), np.float32)]
            valids = [np.zeros(P, bool)]
            labels = [-1]
        return TemplateBank(
            pts=np.stack(rows), valid=np.stack(valids), label=np.asarray(labels, np.int32)
        )

    def of_label(self, label_id: int):
        sel = np.nonzero(self.label == label_id)[0]
        return self.pts[sel], self.valid[sel]


# ---------------------------------------------------------------------------
# The jitted hypothesis sweep
# ---------------------------------------------------------------------------

def _cell_index(g: MatchGridConfig, pts, origin):
    """World point -> (flat cell index, in-bounds).  C-trunc division like the
    reference's int casts (pointcloud_tools.h:748-750)."""
    rel = (pts - origin) / TM_VOXEL_SIZE
    idx = rel.astype(jnp.int32)
    inb = jnp.all((rel >= 0) & (idx < g.grid_n), axis=-1)
    flat = (idx[..., 0] * g.grid_n + idx[..., 1]) * g.grid_n + idx[..., 2]
    return jnp.where(inb, flat, g.num_cells), inb  # num_cells = drop sentinel


@partial(jax.jit, static_argnums=(0, 1))
def template_match(
    g: MatchGridConfig,
    use_freespace: bool,
    src: jax.Array,        # f32[N, 3] source cloud (world frame)
    src_valid: jax.Array,  # bool[N]
    cam_pos: jax.Array,    # f32[3]
    tpl: jax.Array,        # f32[P, 3] centered template
    tpl_valid: jax.Array,  # bool[P]
) -> MatchResult:
    """findBestTemplateTransformationPHD[FSConsidered]
    (pointcloud_tools.h:686-865 / 874-1097) as one jitted sweep."""
    N, P = src.shape[0], tpl.shape[0]
    big = jnp.float32(3.4e38)

    # Source bbox and the point closest to the camera.
    src_inf = jnp.where(src_valid[:, None], src, big)
    src_ninf = jnp.where(src_valid[:, None], src, -big)
    bb_min = jnp.min(src_inf, axis=0)
    d2 = jnp.sum((src - cam_pos) ** 2, axis=1)
    d2 = jnp.where(src_valid, d2, big)
    closest = src[jnp.argmin(d2)]

    expand = TM_EXPAND if use_freespace else 0
    origin = bb_min - expand * TM_VOXEL_SIZE

    # Occupied bitmap.
    cell, inb = _cell_index(g, src, origin)
    cell = jnp.where(src_valid, cell, g.num_cells)
    occ = jnp.zeros(g.num_cells, bool).at[cell].set(True, mode="drop")
    occupied_count = jnp.sum(occ.astype(jnp.int32))

    if use_freespace:
        # Ray casting camera -> each source point, marking free cells until
        # the ray meets an occupied cell (see module docstring for the
        # order-independence deviation).  Sample points at k * step along the
        # ray, k = 0 .. (pointcloud_tools.h:957-983).
        ray = src - cam_pos
        ray_len = jnp.linalg.norm(ray, axis=1, keepdims=True)
        ray_dir = ray / jnp.maximum(ray_len, 1e-6)
        ks = jnp.arange(g.fs_ray_steps, dtype=jnp.float32) * TM_VOXEL_SIZE  # [S]
        samples = cam_pos + ray_dir[:, None, :] * ks[None, :, None]        # [N, S, 3]
        scell, sinb = _cell_index(g, samples, origin)
        live = src_valid[:, None] & (ks[None, :] < ray_len) & (ray_len[:, None, 0] > 1e-6)
        hit_occ = occ[jnp.minimum(scell, g.num_cells - 1)] & sinb
        blocked = jnp.cumsum(hit_occ.astype(jnp.int32), axis=1) > 0  # inclusive: the
        # occupied cell itself breaks before being marked free (':978-981').
        mark = live & sinb & ~blocked
        scell = jnp.where(mark, scell, g.num_cells)
        free = jnp.zeros(g.num_cells, bool).at[scell.reshape(-1)].set(True, mode="drop")
        free = free & ~occ
    else:
        free = jnp.zeros((1,), bool)  # unused

    # Push vector: closest point direction, 10 m (pointcloud_tools.h:735-738).
    to_closest = closest - cam_pos
    push = to_closest / jnp.maximum(jnp.linalg.norm(to_closest), 1e-6) * TM_PUSH_DISTANCE

    angles = jnp.arange(TM_NUM_ANGLES, dtype=jnp.float32) * (10.0 * jnp.pi / 180.0)
    ca, sa = jnp.cos(angles), jnp.sin(angles)
    # Yaw about +y (Eigen AngleAxisf(angle, UnitY), pointcloud_tools.h:779).
    zeros = jnp.zeros_like(ca)
    ones = jnp.ones_like(ca)
    R = jnp.stack(
        [
            jnp.stack([ca, zeros, sa], -1),
            jnp.stack([zeros, ones, zeros], -1),
            jnp.stack([-sa, zeros, ca], -1),
        ],
        -2,
    )  # f32[A, 3, 3]

    # Jitter order (x outer, y inner) matches the reference loop so argmax
    # tie-breaking picks the same hypothesis (pointcloud_tools.h:806-809).
    jr = jnp.arange(-TM_NOISE_RANGE, TM_NOISE_RANGE + 1, dtype=jnp.float32) * TM_VOXEL_SIZE
    jx, jy = jnp.meshgrid(jr, jr, indexing="ij")
    jitter = jnp.stack([jx.reshape(-1), jy.reshape(-1), jnp.zeros(jr.size ** 2)], -1)  # [J, 3]
    J = jitter.shape[0]

    def per_angle(carry, Ra):
        rot = tpl @ Ra.T + push  # rotate then move by push (transform order,
        # pointcloud_tools.h:778-781)
        td2 = jnp.sum(rot * rot, axis=1)
        td2 = jnp.where(tpl_valid, td2, big)
        tpl_closest = rot[jnp.argmin(td2)]
        correct = closest - tpl_closest

        pts = rot[None] + (correct[None] + jitter)[:, None, :]  # [J, P, 3]
        ccell, cinb = _cell_index(g, pts, origin)
        ccell = jnp.where(tpl_valid[None], ccell, g.num_cells)
        # Unique-voxel dedup per jitter: scatter-OR into [J, num_cells].
        hit = jnp.zeros((J, g.num_cells), bool)
        jrow = jnp.broadcast_to(jnp.arange(J, dtype=jnp.int32)[:, None], (J, P))
        hit = hit.at[jrow.reshape(-1), ccell.reshape(-1)].set(True, mode="drop")
        inter = jnp.sum((hit & occ[None]).astype(jnp.int32), axis=1)
        if use_freespace:
            inter = inter - jnp.sum((hit & free[None]).astype(jnp.int32), axis=1)
        return carry, (inter, correct)

    _, (inter_aj, correct_a) = jax.lax.scan(per_angle, 0, R)  # [A, J], [A, 3]

    flat = inter_aj.reshape(-1)
    best = jnp.argmax(flat)  # first max wins == reference's strict '>' update
    best_a = best // J
    best_j = best % J
    best_score = flat[best]

    move = push + correct_a[best_a] + jitter[best_j]
    Rb = R[best_a]
    T = jnp.eye(4, dtype=jnp.float32)
    T = T.at[:3, :3].set(Rb)
    T = T.at[:3, 3].set(move)
    aligned = tpl @ Rb.T + move

    # score > 0 required downstream; an all-miss sweep (intersection 0) keeps
    # the reference's "uninitialized best transform" from mattering.
    score = best_score.astype(jnp.float32) / jnp.maximum(occupied_count, 1)
    return MatchResult(score=score, tmatrix=T, aligned=aligned)


# ---------------------------------------------------------------------------
# Host-side helpers (numpy; clouds are tiny)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnums=(0, 1))
def template_match_bank(
    g: MatchGridConfig,
    use_freespace: bool,
    src: jax.Array,         # f32[N, 3]
    src_valid: jax.Array,   # bool[N]
    cam_pos: jax.Array,     # f32[3]
    tpls: jax.Array,        # f32[T, P, 3] centered templates
    tvalids: jax.Array,     # bool[T, P]
):
    """alignTemplatesToPointCloud (pointcloud_tools.h:333-360): sweep EVERY
    template of the bank in one vmapped program and argmax the PHD score on
    device — replacing the per-template host loop with its per-hypothesis
    blocking ``float(score)`` syncs (round-3 weak #5: the template bench ran
    at 1.1 vs 2.0 fps).  Ties keep the lowest template index (the
    reference's strict '>' best update).

    Returns (best_idx i32, best_score f32, aligned f32[P, 3])."""
    res = jax.vmap(
        lambda t, v: template_match(g, use_freespace, src, src_valid,
                                    cam_pos, t, v)
    )(tpls, tvalids)
    best = jnp.argmax(res.score)
    return best, res.score[best], res.aligned[best]


def compute_mhd(source: np.ndarray, target: np.ndarray) -> float:
    """computeMHD (pointcloud_tools.h:488-501): mean over source points of the
    nearest-neighbor distance to target."""
    if source.shape[0] == 0 or target.shape[0] == 0:
        return float("inf")
    d2 = ((source[:, None, :] - target[None, :, :]) ** 2).sum(-1)
    return float(np.sqrt(d2.min(axis=1)).mean())


def remove_outliers(
    cloud: np.ndarray,
    leaf: float = 0.1,
    cluster_tol: float = 0.2,
    min_cluster: int = 100,
    max_cluster: int = 20000,
) -> np.ndarray:
    """removeOutliers (pointcloud_tools.h:425-469): voxel-grid downsample then
    keep the largest Euclidean cluster.  Clustering over the downsampled cells
    uses 26-neighbor connectivity at the cluster tolerance (equivalent to
    PCL's euclidean clustering at tol >= 2*leaf on gridded points)."""
    if cloud.shape[0] == 0:
        return cloud
    # Voxel downsample: centroid per leaf cell.
    cell = np.floor(cloud / leaf).astype(np.int64)
    key = (cell[:, 0] << 42) + (cell[:, 1] << 21) + cell[:, 2]
    order = np.argsort(key, kind="stable")
    key_s = key[order]
    uniq, start = np.unique(key_s, return_index=True)
    sums = np.add.reduceat(cloud[order], start, axis=0)
    counts = np.diff(np.append(start, key_s.size))
    down = (sums / counts[:, None]).astype(np.float32)

    # Union-find over cells within cluster_tol.
    r = int(np.ceil(cluster_tol / leaf))
    cells = np.floor(down / leaf).astype(np.int64)
    index = {tuple(c): i for i, c in enumerate(cells)}
    parent = np.arange(down.shape[0])

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    tol2 = cluster_tol * cluster_tol
    for i, c in enumerate(cells):
        for dx in range(-r, r + 1):
            for dy in range(-r, r + 1):
                for dz in range(-r, r + 1):
                    j = index.get((c[0] + dx, c[1] + dy, c[2] + dz))
                    if j is not None and j != i:
                        if ((down[i] - down[j]) ** 2).sum() <= tol2:
                            parent[find(i)] = find(j)

    roots = np.array([find(i) for i in range(down.shape[0])])
    labels, counts = np.unique(roots, return_counts=True)
    counts = np.where(counts > max_cluster, 0, counts)
    if counts.max(initial=0) < min_cluster:
        return np.zeros((0, 3), np.float32)
    best = labels[np.argmax(counts)]
    return down[roots == best]
