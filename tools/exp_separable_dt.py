"""Validate the separable distance-transform ALGORITHM (CPU, numpy).

Phase 1: per-column nearest-seed-above/below via last-valid scans.
Phase 2: per-row 1-D jump flood over the column candidates (+2 cleanup).
Exactness check vs brute force over many random + adversarial layouts,
euclidean and manhattan, uniform and non-uniform coordinates.
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def brute(mask, xs, ys, metric):
    sy, sx = np.nonzero(mask)
    if len(sy) == 0:
        return np.full(mask.shape, np.inf)
    px = xs[None, :, None]  # (1, w, s)
    py = ys[:, None, None]
    tx = xs[sx][None, None, :]
    ty = ys[sy][None, None, :]
    if metric == "euclidean":
        d = (px - tx) ** 2 + (py - ty) ** 2
    else:
        d = np.abs(px - tx) + np.abs(py - ty)
    return d.min(axis=2)


def separable(mask, xs, ys, metric, cleanup=2):
    h, w = mask.shape
    ty_w = np.where(mask, ys[:, None], np.inf)

    # phase 1: last-valid down / up
    cyd = ty_w.copy()
    for i in range(1, h):
        keep = np.isfinite(cyd[i])
        cyd[i] = np.where(keep, cyd[i], cyd[i - 1])
    cyu = ty_w.copy()
    for i in range(h - 2, -1, -1):
        keep = np.isfinite(cyu[i])
        cyu[i] = np.where(keep, cyu[i], cyu[i + 1])

    px = np.broadcast_to(xs[None, :], (h, w))
    py = np.broadcast_to(ys[:, None], (h, w))

    def key(ctx, cty):
        if metric == "euclidean":
            d = (px - ctx) ** 2 + (py - cty) ** 2
        else:
            d = np.abs(px - ctx) + np.abs(py - cty)
        return np.where(np.isfinite(cty), d, np.inf)

    # phase 2 init: better of the two own-column candidates
    kd, ku = key(px, cyd), key(px, cyu)
    use_d = kd <= ku
    tx = np.where(use_d | (ku == np.inf), np.where(kd == np.inf, np.inf, px),
                  px)
    tx = np.where(np.minimum(kd, ku) == np.inf, np.inf, px)
    ty = np.where(use_d, cyd, cyu)
    best = np.minimum(kd, ku)

    # phase 2: 1-D jump flood over x
    k = 1
    while k < w:
        k *= 2
    strides = []
    k //= 2
    while k >= 1:
        strides.append(k)
        k //= 2
    strides += [2, 1][:cleanup]

    def shift(a, s):
        out = np.full_like(a, np.inf)
        if s > 0:
            out[:, s:] = a[:, :-s]
        elif s < 0:
            out[:, :s] = a[:, -s:]
        else:
            out = a.copy()
        return out

    # anchored candidates: the per-column (own) candidate is immutable;
    # every hop also evaluates the SOURCE pixel's own-column candidate,
    # restoring the anchor property plain JFA gets from dist-0 seeds.
    # One anchor suffices: up-vs-down comparison shares |dx| for every
    # receiver in the row, so the init winner is the column's winner for
    # the whole row.
    own_tx, own_ty = tx.copy(), ty.copy()
    for k in strides:
        for s in (-k, k):
            for ctx, cty in ((shift(tx, s), shift(ty, s)),
                             (shift(own_tx, s), shift(own_ty, s))):
                nd = key(ctx, cty)
                better = nd < best
                tx = np.where(better, ctx, tx)
                ty = np.where(better, cty, ty)
                best = np.where(better, nd, best)
    return best, tx, ty


def run_case(rng, h, w, layout, metric, nonuniform):
    mask = np.zeros((h, w), bool)
    if layout == "random":
        n = rng.integers(1, max(2, h * w // 50))
        mask[rng.integers(0, h, n), rng.integers(0, w, n)] = True
    elif layout == "sparse":
        n = rng.integers(1, 4)
        mask[rng.integers(0, h, n), rng.integers(0, w, n)] = True
    elif layout == "corners":
        mask[0, 0] = mask[-1, -1] = True
    elif layout == "line":
        mask[h // 2, :] = rng.random(w) < 0.1
        mask[h // 2, 0] = True
    elif layout == "cluster":
        cy, cx = rng.integers(0, h), rng.integers(0, w)
        for _ in range(10):
            mask[np.clip(cy + rng.integers(-2, 3), 0, h - 1),
                 np.clip(cx + rng.integers(-2, 3), 0, w - 1)] = True
    elif layout == "diag":
        for i in range(min(h, w)):
            if rng.random() < 0.3:
                mask[i, i] = True
        mask[0, 0] = True
    if nonuniform:
        xs = np.sort(rng.random(w)).astype(np.float64) * w
        ys = np.sort(rng.random(h)).astype(np.float64) * h
        if rng.random() < 0.5:
            ys = ys[::-1].copy()  # decreasing y like rasters
    else:
        xs = np.arange(w, dtype=np.float64)
        ys = np.arange(h, dtype=np.float64)[::-1].copy()

    b = brute(mask, xs, ys, metric)
    s, tx, ty = separable(mask, xs, ys, metric)
    bad = ~np.isclose(s, b, rtol=1e-12, atol=1e-12)
    bad &= ~(np.isinf(s) & np.isinf(b))
    return bad.sum(), np.max(np.abs(np.where(np.isfinite(b), s - b, 0)))


def main():
    rng = np.random.default_rng(7)
    fails = 0
    cases = 0
    worst = 0.0
    for trial in range(400):
        h = int(rng.integers(3, 80))
        w = int(rng.integers(3, 80))
        layout = rng.choice(["random", "sparse", "corners", "line",
                             "cluster", "diag"])
        metric = rng.choice(["euclidean", "manhattan"])
        nonuniform = bool(rng.random() < 0.4)
        nbad, mdiff = run_case(rng, h, w, layout, metric, nonuniform)
        cases += 1
        worst = max(worst, mdiff)
        if nbad:
            fails += 1
            print(f"FAIL h={h} w={w} {layout} {metric} nonuni={nonuniform}: "
                  f"{nbad} cells, maxdiff {mdiff:.3e}")
    print(f"{cases} cases, {fails} failures, worst diff {worst:.3e}")


if __name__ == "__main__":
    main()
