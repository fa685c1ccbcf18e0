"""Friends-of-friends halo finding and halo mass functions.

Replaces the reference's nbodykit+MPI FoF pipeline (``scripts/halos.py:
352-465``) with a host-side periodic FoF built on scipy (cKDTree pair search
in spatial chunks + union-find), plus:

  * empirical HMF dn/dlog10M with the Warren-style FoF mass-bias correction
    the reference applies (``halos.py:317-342``: n -> n(1 - n^-0.6));
  * Tinker et al. 2008 theory HMF from the linear P(k) (replacing Pylians
    ``MF_theory``).

Scale note: this is a validation tool.  It comfortably handles up to a few
hundred^3 particles on one host; the reference needed MPI because nbodykit
distributes — at pod scale the emulator outputs stay sharded and a
distributed FoF would be a separate subsystem.
"""

from __future__ import annotations

import numpy as np

RHO_CRIT = 2.77536627e11  # M_sun/h / (Mpc/h)^3


def positions_from_displacement(psi, boxsize: float):
    """Eulerian positions x = (q + psi) mod L of grid particles.

    Reference: ``halos.py:359-404`` (without the MPI slab split).

    Args:
        psi: (3, N, N, N) displacement [Mpc/h].
        boxsize: box side [Mpc/h].

    Returns:
        (N^3, 3) float32 positions in [0, L).
    """
    psi = np.asarray(psi, np.float32)
    n = psi.shape[1]
    q = (np.arange(n, dtype=np.float32)) * (boxsize / n)
    qx, qy, qz = np.meshgrid(q, q, q, indexing="ij")
    pos = np.stack(
        [qx + psi[0], qy + psi[1], qz + psi[2]], axis=-1
    ).reshape(-1, 3)
    return np.mod(pos, boxsize).astype(np.float32)


def friends_of_friends(
    positions: np.ndarray,
    boxsize: float,
    linking_length: float,
    nmin: int = 20,
    chunk: int = 2_000_000,
):
    """Periodic FoF group finder.

    Args:
        positions: (Np, 3) in [0, boxsize).
        boxsize: periodic box side.
        linking_length: absolute linking length b (same units).
        nmin: minimum group multiplicity to report.
        chunk: pair-search chunk size (memory control).

    Returns:
        dict with 'labels' (Np,) int32 (-1 for unreported), 'lengths',
        'centers' (group CM positions, periodic-aware), 'n_groups'.
    """
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import connected_components
    from scipy.spatial import cKDTree

    pos = np.asarray(positions, np.float64)
    n_p = len(pos)
    tree = cKDTree(pos, boxsize=boxsize)

    rows, cols = [], []
    for start in range(0, n_p, chunk):
        sub = pos[start : start + chunk]
        pairs_lists = tree.query_ball_point(sub, r=linking_length, workers=-1)
        for i, neigh in enumerate(pairs_lists):
            gi = start + i
            arr = np.asarray(neigh, np.int64)
            arr = arr[arr > gi]  # dedupe (i<j) and drop self
            if arr.size:
                rows.append(np.full(arr.size, gi, np.int64))
                cols.append(arr)
    if rows:
        rows = np.concatenate(rows)
        cols = np.concatenate(cols)
    else:
        rows = np.zeros(0, np.int64)
        cols = np.zeros(0, np.int64)

    graph = coo_matrix((np.ones(len(rows), np.int8), (rows, cols)), shape=(n_p, n_p))
    n_comp, labels = connected_components(graph, directed=False)

    lengths = np.bincount(labels, minlength=n_comp)
    keep = lengths >= nmin
    group_ids = np.nonzero(keep)[0]
    remap = -np.ones(n_comp, np.int64)
    remap[group_ids] = np.arange(len(group_ids))
    out_labels = remap[labels].astype(np.int32)

    # Periodic center of mass via circular mean per axis.
    centers = np.zeros((len(group_ids), 3), np.float64)
    two_pi = 2 * np.pi / boxsize
    for d in range(3):
        ang = pos[:, d] * two_pi
        cs = np.zeros(n_comp)
        sn = np.zeros(n_comp)
        np.add.at(cs, labels, np.cos(ang))
        np.add.at(sn, labels, np.sin(ang))
        mean_ang = np.arctan2(sn[group_ids], cs[group_ids])
        centers[:, d] = np.mod(mean_ang / (2 * np.pi), 1.0) * boxsize

    return {
        "labels": out_labels,
        "lengths": lengths[group_ids].astype(np.int64),
        "centers": centers.astype(np.float32),
        "n_groups": int(len(group_ids)),
    }


def particle_mass_msun_h(boxsize: float, n_part: int, Om: float) -> float:
    """Mass of one grid particle [M_sun/h] (reference halos.py:345-349)."""
    return RHO_CRIT * Om * boxsize**3 / n_part**3


def empirical_hmf(
    lengths: np.ndarray,
    particle_mass: float,
    boxsize: float,
    bins_per_dex: int = 5,
    fof_correction: bool = True,
):
    """dn/dlog10M from FoF multiplicities.

    ``fof_correction`` applies the Warren et al. 2006 FoF discreteness bias
    n_corr = n (1 - n^-0.6) before converting to mass (reference
    ``halos.py:317-342``).
    """
    n = np.asarray(lengths, np.float64)
    if fof_correction:
        n = n * (1.0 - n**-0.6)
    masses = n * particle_mass
    logm = np.log10(masses)
    lo = np.floor(logm.min() * bins_per_dex) / bins_per_dex
    hi = np.ceil(logm.max() * bins_per_dex) / bins_per_dex
    edges = np.arange(lo, hi + 1e-9, 1.0 / bins_per_dex)
    counts, _ = np.histogram(logm, bins=edges)
    vol = boxsize**3
    dlog = np.diff(edges)
    centers = 10 ** (0.5 * (edges[1:] + edges[:-1]))
    dn = counts / vol / dlog
    err = np.sqrt(counts) / vol / dlog
    return centers, dn, err


def tinker08_hmf(m_grid, k_table, p_table, Om: float, z: float = 0.0, growth=None):
    """Tinker et al. 2008 (Delta=200m) dn/dlog10M [h^3/Mpc^3 per dex].

    Args:
        m_grid: halo masses [M_sun/h].
        k_table, p_table: z=0 linear spectrum [h/Mpc, (Mpc/h)^3].
        Om: matter density.
        z: redshift (growth applied to sigma); ``growth`` overrides D(z).
    """
    from .linear_pk import sigma_r

    m = np.asarray(m_grid, np.float64)
    rho_m = RHO_CRIT * Om
    r = (3 * m / (4 * np.pi * rho_m)) ** (1.0 / 3.0)

    if growth is None:
        if z == 0.0:
            growth = 1.0
        else:
            from ..cosmology import growth_factor

            growth = float(growth_factor(z, Om))

    sig = np.array([sigma_r(k_table, p_table, float(ri)) for ri in r]) * growth

    # Tinker08 Delta=200 (mean) parameters with redshift evolution.
    A = 0.186 * (1 + z) ** -0.14
    a = 1.47 * (1 + z) ** -0.06
    alpha = 10 ** (-((0.75 / np.log10(200.0 / 75.0)) ** 1.2))
    b = 2.57 * (1 + z) ** -alpha
    c = 1.19
    f_sigma = A * ((sig / b) ** -a + 1.0) * np.exp(-c / sig**2)

    ln_sig_inv = -np.log(sig)
    dlnsinv_dlogm = np.gradient(ln_sig_inv, np.log10(m))
    dn_dlog10m = f_sigma * (rho_m / m) * dlnsinv_dlogm
    return dn_dlog10m
