"""TPU-batched plus-shape prior sweep.

The plus-shape ABC ground truth needs 1e8 (x, y) prior draws
(/root/reference/rejection_sampling.py:76) — ~42 GB, ~2 h on the 1-core
host through the C++ generator, and the gitignored ``abc/`` bulk data is
wiped every reboot. This module re-derives the whole plus pipeline
(/root/reference/data.py:167-252, re-implemented host-side in
``data/fourier.py`` + ``data/geometry.py``) as a batched JAX program:

* the **union outline** of the two bars is built in closed form instead of
  the host's generic split-and-chain walk (`geometry.rect_union_outline`):
  with xbar = [A0,A1]×[a0,a1] and ybar = [b0,b1]×[B0,B1], each of the four
  corner regions of the union contributes either one vertex (a plain
  rectangle corner) or a three-vertex detour (an arm or a staircase),
  picked by two sign predicates per corner. Because xlength ≥ 3 > 2 ≥
  ywidth (and symmetrically), neither bar's span ever contains the
  other's, so these 4×4 cases are exhaustive. The ≤12 candidates are
  compacted by emit-rank and rolled so slot 0 is the host walk's start
  vertex (the first kept piece of xbar's bottom edge): (A0,a0) when
  A0 < b0, else ring index 2 — matching `rect_union_outline`
  vertex-for-vertex in order (the DFT start phase depends on it);
* **densify_polyline** (data.py:176-186) becomes 12 static masked segment
  fills into (B, 256) split coordinate planes: segment i holds
  n_i = max(1, round(max|Δ|∞/0.2)) points at slots [off_i, off_i+n_i)
  with t = (j-off_i)/(n_i-1) — linspace semantics, duplicate shared
  vertices included, exactly the host's interleave;
* centering, rotation, offset and the label y = (center, angle,
  xwidth/ywidth) are closed form (data.py:209-225) — no pairwise-distance
  screen is needed for the plus family;
* the 25-coefficient DFT (m = -12..12) uses the conjugate symmetry of a
  real polyline: only m = 0..12 are computed (angle-addition recurrence
  from one (B, 256) trig pair) and only those 50 unique values cross the
  tunnel; the host mirrors Re(-m) = Re(m), Im(-m) = -Im(m) when unpacking
  (the tunnel sustains ~25 MB/s, so halving x's 400 B/row is ~2x pool
  throughput).

Rows where f32 could disagree with the host's f64 decisions are flagged
and fully regenerated on the host from the same (length, width, shift,
angle, offset) draws: corner predicates within 1e-5 of a tie, a densify
count within 1e-5 of the round-half boundary, or a ring that overflows
capacity (never at these geometry bounds). Expected flag rate ~1e-4.

Parity is **distributional, not bit-level**, same as ``lens_tpu``: the
host engines consume a numpy MT19937 stream draw-by-draw, which a JAX
threefry program cannot reproduce. Chunk seeding is deterministic
(PRNGKey per dispatch), so a TPU-built pool resumes/extends
bit-identically against itself.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

RING = 12  # union-outline capacity: 4 corners x up to 3 vertices
P2 = 256  # densified-polyline capacity (max ~146 points at these bounds)
N_COEFFS = 25  # 25 complex 2-D Fourier coefficients -> x in R^100
M_MAX = N_COEFFS // 2  # 12
MAX_DIST = 0.2  # densify_polyline default (data.py:177)
PRED_EPS = 1e-5  # f32-vs-f64 ambiguity band on corner predicates
ROUND_EPS = 1e-5  # ambiguity band on the densify round-half boundary
N_PACK = 55  # packed columns: Re(2x13) | Im(2x12) | y(4) | flag


def _union_ring(A0, A1, a0, a1, b0, b1, B0, B1):
    """Closed-form union outline of xbar x ybar, host walk order.

    Returns (rx, ry (B, 12), V (B,), pred_margin (B,)): the compacted,
    start-rolled ring, its length, and the smallest |predicate| margin
    (rows where it is within PRED_EPS are host-regenerated).
    """
    pl = A0 < b0  # xbar protrudes left of ybar
    pr = A1 > b1  # xbar protrudes right
    pb = B0 < a0  # ybar protrudes below xbar
    pt = B1 > a1  # ybar protrudes above

    def grp(pA, pB, full, stair, singleA, singleB):
        """One corner group: 3 candidate slots + emit count.

        pA&pB -> ``full`` (the arm detour), !pA&!pB -> ``stair`` (the
        staircase), pA only -> [singleA], pB only -> [singleB].
        """
        three = pA == pB  # both or neither -> 3 vertices
        cand = []
        for s in range(3):
            fx, fy = full[s]
            sx, sy = stair[s]
            cx = jnp.where(pA, jnp.where(pB, fx, singleA[0]),
                           jnp.where(pB, singleB[0], sx))
            cy = jnp.where(pA, jnp.where(pB, fy, singleA[1]),
                           jnp.where(pB, singleB[1], sy))
            cand.append((cx, cy))
        emit = [jnp.ones_like(three), three, three]
        return cand, emit

    bl = grp(pl, pb, [(A0, a0), (b0, a0), (b0, B0)],
             [(b0, B0), (A0, B0), (A0, a0)], (A0, a0), (b0, B0))
    br = grp(pr, pb, [(b1, B0), (b1, a0), (A1, a0)],
             [(A1, a0), (A1, B0), (b1, B0)], (A1, a0), (b1, B0))
    tr = grp(pr, pt, [(A1, a1), (b1, a1), (b1, B1)],
             [(b1, B1), (A1, B1), (A1, a1)], (A1, a1), (b1, B1))
    tl = grp(pl, pt, [(b0, B1), (b0, a1), (A0, a1)],
             [(A0, a1), (A0, B1), (b0, B1)], (A0, a1), (b0, B1))

    cand_x = jnp.stack([c[0] for g in (bl, br, tr, tl) for c in g[0]], axis=1)
    cand_y = jnp.stack([c[1] for g in (bl, br, tr, tl) for c in g[0]], axis=1)
    emit = jnp.stack([e for g in (bl, br, tr, tl) for e in g[1]], axis=1)
    rank = jnp.cumsum(emit, axis=1, dtype=jnp.int32)  # 1-based at emits
    V = rank[:, -1]
    # host walk starts at the first kept piece of xbar's bottom edge:
    # (A0,a0) when A0 < b0 (canonical slot 0), else canonical slot 2
    # ((A0,a0) of the BL staircase, or (b1,a0) of the BR arm — both land
    # at ring index 2 because the BL group then has exactly one vertex).
    start = jnp.where(pl, 0, 2)
    target = jnp.mod(rank - 1 - start[:, None], jnp.maximum(V, 1)[:, None])
    slots = jnp.arange(RING, dtype=jnp.int32)
    onehot = (target[:, None, :] == slots[None, :, None]) & emit[:, None, :].astype(bool)
    rx = jnp.sum(jnp.where(onehot, cand_x[:, None, :], 0.0), axis=2)
    ry = jnp.sum(jnp.where(onehot, cand_y[:, None, :], 0.0), axis=2)
    pred_margin = jnp.minimum(
        jnp.minimum(jnp.abs(A0 - b0), jnp.abs(A1 - b1)),
        jnp.minimum(jnp.abs(B0 - a0), jnp.abs(B1 - a1)),
    )
    return rx, ry, V, pred_margin


def _densify(rx, ry, V):
    """Masked batched densify_polyline (data.py:176-186).

    Segment i runs ring[i] -> ring[(i+1) % V] and contributes
    n_i = max(1, round(max|Δ|∞ / 0.2)) points (t = linspace(0,1,n_i),
    duplicating shared vertices — the host's np.concatenate of per-piece
    linspaces). Returns (px, py (B, P2), N (B,), round_margin (B,)).
    """
    slots = jnp.arange(RING, dtype=jnp.int32)[None]
    nx = jnp.concatenate([rx[:, 1:], rx[:, :1]], axis=1)
    ny = jnp.concatenate([ry[:, 1:], ry[:, :1]], axis=1)
    wrap = slots == (V - 1)[:, None]
    nx = jnp.where(wrap, rx[:, :1], nx)
    ny = jnp.where(wrap, ry[:, :1], ny)
    live = slots < V[:, None]
    d_inf = jnp.maximum(jnp.abs(nx - rx), jnp.abs(ny - ry))
    frac = d_inf / MAX_DIST
    n_i = jnp.where(live, jnp.maximum(1, jnp.round(frac).astype(jnp.int32)), 0)
    # distance of each count to the round-half flip point (host rounds the
    # f64 value; a f32 count on the boundary could disagree)
    half_gap = jnp.abs(frac - (jnp.floor(frac) + 0.5))
    round_margin = jnp.min(jnp.where(live, half_gap, jnp.inf), axis=1)
    off = jnp.cumsum(n_i, axis=1) - n_i  # exclusive prefix
    N = jnp.sum(n_i, axis=1)
    j = jnp.arange(P2, dtype=jnp.float32)[None]
    px = jnp.zeros(rx.shape[:1] + (P2,), jnp.float32)
    py = jnp.zeros_like(px)
    for i in range(RING):
        o = off[:, i : i + 1].astype(jnp.float32)
        n = n_i[:, i : i + 1].astype(jnp.float32)
        t = (j - o) / jnp.maximum(n - 1.0, 1.0)
        m = (j >= o) & (j < o + n)
        px = px + jnp.where(m, (1.0 - t) * rx[:, i : i + 1] + t * nx[:, i : i + 1], 0.0)
        py = py + jnp.where(m, (1.0 - t) * ry[:, i : i + 1] + t * ny[:, i : i + 1], 0.0)
    return px, py, N, round_margin


def _dft_unique(px, py, N):
    """m = 0..12 DFT coefficients of the masked (B, P2) polyline.

    coeff_m = (1/N) Σ_j p_j e^{-2πi m j / N}; harmonics by angle-addition
    recurrence from the m = 1 trig pair. Returns (re (B, 2, 13),
    im (B, 2, 13)); m < 0 follows from conjugate symmetry of a real
    signal (fourier_coeffs, data.py:42-49).
    """
    B = px.shape[0]
    j = jnp.arange(P2, dtype=jnp.float32)[None]
    vf = (j < N[:, None].astype(jnp.float32)).astype(jnp.float32)
    nf = N.astype(jnp.float32)[:, None]
    beta = -2.0 * jnp.pi * j / nf
    c1, s1 = jnp.cos(beta) * vf, jnp.sin(beta) * vf  # masked harmonics
    mx = px * vf
    my = py * vf
    res, ims = [], []
    cm, sm = vf, jnp.zeros_like(vf)  # m = 0
    for _m in range(M_MAX + 1):
        res.append(jnp.stack([jnp.sum(mx * cm, 1), jnp.sum(my * cm, 1)], 1))
        ims.append(jnp.stack([jnp.sum(mx * sm, 1), jnp.sum(my * sm, 1)], 1))
        cm, sm = cm * c1 - sm * s1, sm * c1 + cm * s1
    re = jnp.stack(res, axis=2) / nf[:, :, None]  # (B, 2, 13)
    im = jnp.stack(ims, axis=2) / nf[:, :, None]
    return re, im


def _pipeline(xl, yl, xw, yw, xs, ys, angle, off):
    """Ring → densify → transform → DFT → pack, for given draws.

    Split out of `_chunk_body` so parity tests can feed the exact same
    parameters to this and to `_regen_host`. Returns packed (B, 55)."""
    B = xl.shape[0]
    rx, ry, V, pred_margin = _union_ring(
        xs - xl / 2, xs + xl / 2, -xw / 2, xw / 2,
        -yw / 2, yw / 2, ys - yl / 2, ys + yl / 2,
    )
    px, py, N, round_margin = _densify(rx, ry, V)
    j = jnp.arange(P2, dtype=jnp.float32)[None]
    vf = (j < N[:, None].astype(jnp.float32)).astype(jnp.float32)
    nf = N.astype(jnp.float32)
    mean_x = jnp.sum(px * vf, axis=1) / nf
    mean_y = jnp.sum(py * vf, axis=1) / nf
    cx, cy = px - mean_x[:, None], py - mean_y[:, None]
    ca, sa = jnp.cos(angle), jnp.sin(angle)
    # np.dot(coords, [[c, s], [-s, c]]): x' = x·c - y·s, y' = x·s + y·c
    qx = cx * ca[:, None] - cy * sa[:, None] + off[:, 0:1]
    qy = cx * sa[:, None] + cy * ca[:, None] + off[:, 1:2]
    # center starts at the origin, follows -mean, the rotation, and the
    # offset (data.py:209-222)
    ctr_x = (-mean_x) * ca - (-mean_y) * sa + off[:, 0]
    ctr_y = (-mean_x) * sa + (-mean_y) * ca + off[:, 1]
    re, im = _dft_unique(qx, qy, N)
    y = jnp.stack([ctr_x, ctr_y, angle, xw / yw], axis=1)
    flag = (
        (pred_margin < PRED_EPS) | (round_margin < ROUND_EPS) | (N > P2)
    ).astype(jnp.float32)
    packed = jnp.concatenate(
        [
            re.reshape(B, 2 * (M_MAX + 1)),
            im[:, :, 1:].reshape(B, 2 * M_MAX),
            y,
            flag[:, None],
        ],
        axis=1,
    )
    params = jnp.stack([xl, yl, xw, yw, xs, ys, angle], axis=1)
    return packed, jnp.concatenate([params, off], axis=1)


def _chunk_body(key, B):
    """One sub-batch of the pool sweep: prior draws + pipeline.

    The prior matches generate_plus_shape's unconditional branch
    (data.py:188-215, 223, 229): lengths ~ U[3,5], widths ~ U[0.5,2],
    shifts ~ U[-1.5,1.5], angle ~ U[0, π/2], offset ~ 0.5·N(0,I₂).
    Returns (packed (B, 55), params (B, 9)); params stay on device —
    the host fetches them only when a flagged row needs f64 regeneration
    (~1e-4 of rows)."""
    ks = jax.random.split(key, 8)
    u = lambda k: jax.random.uniform(k, (B,), jnp.float32)
    xl = 3.0 + 2.0 * u(ks[0])
    yl = 3.0 + 2.0 * u(ks[1])
    xw = 0.5 + 1.5 * u(ks[2])
    yw = 0.5 + 1.5 * u(ks[3])
    xs = -1.5 + 3.0 * u(ks[4])
    ys = -1.5 + 3.0 * u(ks[5])
    angle = 0.5 * jnp.pi * u(ks[6])
    off = 0.5 * jax.random.normal(ks[7], (B, 2), jnp.float32)
    return _pipeline(xl, yl, xw, yw, xs, ys, angle, off)


@functools.partial(jax.jit, static_argnums=(1, 2))
def _chunk_kernel(key, B, G=1):
    """G sub-batches per dispatch, one packed (G·B, 55) transfer —
    same tunnel-amortization scheme as ``lens_tpu._chunk_kernel``."""
    if G == 1:
        return _chunk_body(key, B)
    keys = jax.vmap(lambda g: jax.random.fold_in(key, g))(jnp.arange(G))
    packed, params = jax.lax.map(lambda k: _chunk_body(k, B), keys)
    return packed.reshape(G * B, N_PACK), params.reshape(G * B, 9)


def _unpack_x(packed: np.ndarray) -> np.ndarray:
    """Mirror the 50 unique coefficients into the flat 100-dim x:
    flatten_coeffs layout [Re_x(m=-12..12), Re_y(..), Im_x(..), Im_y(..)]
    with Re(-m) = Re(m), Im(-m) = -Im(m)."""
    B = packed.shape[0]
    re = packed[:, : 2 * (M_MAX + 1)].reshape(B, 2, M_MAX + 1)
    im = np.concatenate(
        [np.zeros((B, 2, 1), packed.dtype), packed[:, 2 * (M_MAX + 1) : 50].reshape(B, 2, M_MAX)],
        axis=2,
    )
    x = np.empty((B, 4 * N_COEFFS), packed.dtype)
    for d in range(2):
        x[:, d * N_COEFFS + M_MAX : (d + 1) * N_COEFFS] = re[:, d]
        x[:, d * N_COEFFS : d * N_COEFFS + M_MAX] = re[:, d, :0:-1]
        base = 2 * N_COEFFS + d * N_COEFFS
        x[:, base + M_MAX : base + N_COEFFS] = im[:, d]
        x[:, base : base + M_MAX] = -im[:, d, :0:-1]
    return x


def _regen_host(params: np.ndarray):
    """Host (f64) regeneration of flagged rows from the same draws.

    params rows are (xl, yl, xw, yw, xshift, yshift, angle, offx, offy).
    Replays generate_plus_shape (data.py:188-225) through the host
    geometry/DFT with the randomness substituted. Returns (x (R, 100)
    f32, y (R, 4) f32). Rare (~1e-4), so a per-row loop is fine.
    """
    from hint_tpu.data import geometry as geo
    from hint_tpu.data.fourier import PlusShapeModel

    model = PlusShapeModel()
    xs_out, ys_out = [], []
    for row in np.asarray(params, np.float64):
        xl, yl, xw, yw, xshift, yshift, angle, offx, offy = row
        xbar = ((xshift - xl / 2, -xw / 2), (xshift + xl / 2, xw / 2))
        ybar = ((-yw / 2, yshift - yl / 2), (yw / 2, yshift + yl / 2))
        coords = model.densify_polyline(geo.rect_union_outline(xbar, ybar))
        center = -coords.mean(axis=0)
        coords = coords - coords.mean(axis=0)
        rot = np.array(
            [[np.cos(angle), np.sin(angle)], [-np.sin(angle), np.cos(angle)]]
        )
        coords = coords @ rot
        center = center @ rot + np.array([offx, offy])
        coords = coords + np.array([offx, offy])
        xs_out.append(
            model.flatten_coeffs(model.fourier_coeffs(coords, n_coeffs=N_COEFFS)[None])[0]
        )
        ys_out.append([center[0], center[1], angle, xw / yw])
    return (
        np.stack(xs_out).astype(np.float32),
        np.asarray(ys_out, np.float32),
    )


def _host_finish(packed: np.ndarray, extras) -> tuple[np.ndarray, np.ndarray]:
    """Unpack one transferred chunk; regenerate flagged rows on the host."""
    x = _unpack_x(packed[:, :50])
    y = np.ascontiguousarray(packed[:, 50:54])
    flagged = packed[:, 54] != 0.0
    if flagged.any():
        params = np.asarray(extras)  # lazy D2H
        x_fix, y_fix = _regen_host(params[flagged])
        x[flagged] = x_fix
        y[flagged] = y_fix
    return x, y


def sample_joint(
    n: int,
    seed: int = 0,
    sub_batch: int = 32768,
    noise: bool = True,
    group: int = 8,
) -> tuple[np.ndarray, np.ndarray]:
    """Draw n plus-shape (x, y) prior pairs on the accelerator.

    Deterministic in (n, seed, sub_batch, group); same dispatch/seed
    layout and transfer pipelining as ``lens_tpu.sample_joint``. ``noise``
    is accepted for interface parity and ignored — the plus label is
    exact at generation time (data.py:224-225).
    """
    del noise
    base = jax.random.PRNGKey(seed)
    g_eff = max(1, min(group, -(-n // sub_batch)))
    rows = g_eff * sub_batch
    n_disp = max(1, -(-n // rows))

    def dispatch(i):
        packed, params = _chunk_kernel(jax.random.fold_in(base, i), sub_batch, g_eff)
        try:
            packed.copy_to_host_async()
        except Exception:
            pass
        return packed, params

    xs, ys = [], []
    pending = dispatch(0)
    for i in range(n_disp):
        nxt = dispatch(i + 1) if i + 1 < n_disp else None
        packed, extras = pending
        x, y = _host_finish(np.asarray(packed), extras)
        take = min(rows, n - i * rows)
        xs.append(x[:take])
        ys.append(y[:take])
        pending = nxt
    return np.concatenate(xs), np.concatenate(ys)
