"""Distributed model training over sufficient statistics.

The k-means loop (``pipelines/queries.py::kmeans_embeddings``) broadcasts
k×d floats per round; the same shape covers generalized linear models:
each Newton/IRLS round is ONE map over the feature table emitting a
per-block (gradient, Hessian, loss) partial — O(d + d²) floats per
block — and the driver solves a d×d system.  Rows never leave the
workers; at 100 TB the only materialized state is the slim projected
feature table (d+1 doubles per row, spillable).

No reference equivalent; textbook IRLS (Bishop PRML §4.3.3).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _sigmoid(z: np.ndarray) -> np.ndarray:
    out = np.empty_like(z)
    pos = z >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-z[pos]))
    e = np.exp(z[~pos])
    out[~pos] = e / (1.0 + e)
    return out


def logreg_train(
    ds,
    x_cols,
    y_col: str,
    iters: int = 8,
    ridge: float = 1e-6,
):
    """Newton-Raphson logistic regression: intercept + ``x_cols``
    features, ``y_col`` in {0,1}.  Each round maps the (materialized,
    slim) feature table to per-block partials — gradient d floats,
    Hessian d² floats, negative log-likelihood scalar — and the driver
    folds O(blocks) partials and solves (H + ridge·I)·Δ = g.

    Returns (weights ndarray[d+1], diagnostics dict).  Certification:
    the ridge-regularized NLL is asserted non-increasing across ACCEPTED
    rounds — a wrong gradient or Hessian breaks monotonicity
    immediately.  Raw Newton is not globally monotone (it can overshoot
    on near-separable or badly scaled data), so a step that raises the
    NLL is retried with a halved step (standard damping, ≤ 8 halvings)
    before the certification applies; the halving count is reported in
    diagnostics.  The RETURNED weights are always a certified iterate:
    the loop ends with one extra evaluation of the final step (damping
    it like any other) rather than returning an unchecked Newton step."""
    x_cols = list(x_cols)
    d = len(x_cols) + 1

    def project(t: pa.Table) -> pa.Table:
        cols = {"__y": t[y_col]}
        for c in x_cols:
            cols[c] = t[c]
        return pa.table(cols)

    slim = ds.map_batches(project, batch_format="pyarrow").materialize()

    w = np.zeros(d)
    nll_hist = []
    halvings = 0
    pending_step = None  # (base_w, direction, scale) from a damped retry
    pending_step_halvings = 0
    steps_taken = 0
    while True:  # exits once the FINAL iterate's NLL is itself certified
        w_round = w.copy()

        def partial(t: pa.Table, _w=w_round) -> pa.Table:
            n = len(t)
            X = np.empty((n, d))
            X[:, 0] = 1.0
            for j, c in enumerate(x_cols):
                X[:, j + 1] = t[c].to_numpy(zero_copy_only=False)
            y = t["__y"].to_numpy(zero_copy_only=False).astype(np.float64)
            z = X @ _w
            p = _sigmoid(z)
            g = X.T @ (y - p)
            h = X.T @ (X * (p * (1.0 - p))[:, None])
            # numerically-stable NLL: log(1+e^z) - y z, computed as
            # softplus via logaddexp
            nll = float(np.logaddexp(0.0, z).sum() - (y * z).sum())
            return pa.table(
                {
                    "g": pa.array([g.tobytes()], pa.binary()),
                    "h": pa.array([h.tobytes()], pa.binary()),
                    "nll": pa.array([nll], pa.float64()),
                    "n": pa.array([n], pa.int64()),
                }
            )

        parts = slim.map_batches(partial, batch_format="pyarrow").take_all()
        g = np.zeros(d)
        H = np.zeros((d, d))
        nll = 0.0
        n_total = 0
        for r in parts:
            g += np.frombuffer(r["g"], np.float64)
            H += np.frombuffer(r["h"], np.float64).reshape(d, d)
            nll += r["nll"]
            n_total += r["n"]
        nll += 0.5 * ridge * float(w_round @ w_round)
        if pending_step is not None and nll_hist and nll > nll_hist[-1] + 1e-9:
            # damping: the last Newton step overshot (raw Newton is not
            # globally monotone) — halve it and re-evaluate from the
            # accepted base instead of failing certification
            base_w, step, scale = pending_step
            if halvings - pending_step_halvings >= 8:
                raise AssertionError(
                    f"NLL increased at step {steps_taken} and 8 halvings "
                    f"did not recover: {nll_hist[-1]} -> {nll} "
                    "(wrong grad/Hessian?)"
                )
            halvings += 1
            scale *= 0.5
            w = base_w + scale * step
            pending_step = (base_w, step, scale)
            continue
        nll_hist.append(nll)
        pending_step = None
        g -= ridge * w_round  # gradient of the RIDGE objective — also
        #                       what grad_norm reports on the break path
        if steps_taken >= iters:
            break  # w == w_round was just evaluated and certified —
            #        the returned weights are never an unchecked step
        H += ridge * np.eye(d)
        step = np.linalg.solve(H, g)
        w = w_round + step
        pending_step = (w_round, step, 1.0)
        pending_step_halvings = halvings
        steps_taken += 1

    return w, {
        "nll": nll_hist,
        "n": n_total,
        "grad_norm": float(np.linalg.norm(g)),
        "halvings": halvings,
    }


def binary_auc(ds, score_col: str, label_col: str):
    """EXACT ROC-AUC (Mann-Whitney with tie correction) as a distributed
    rank statistic: one value-histogram combiner pass groups the stream
    to (score, n, n_pos) — the same O(distinct)-state shape as the exact-
    quantile operator — then a single tiny sorted pass accumulates
    2·avgrank = 2·cum_less + n + 1 in INTEGER space, so the final
    ``(S2 - n1(n1+1)) / (2 n1 n0)`` is one IEEE expression on exact ints
    and a SQL oracle computes the identical double.

    Scale note: the final pass is O(distinct scores) on one worker; a
    score column with unbounded distinct values goes through the
    range-partitioned rank machinery (``functions/sort.py``) instead."""
    import pyarrow.compute as pc

    from .agg import partial_sum_groupby

    def widen(t: pa.Table) -> pa.Table:
        # nulls are not values (module convention): a null label must
        # not count as a negative, a null score must not hold a rank
        t = t.filter(
            pc.and_(pc.is_valid(t[score_col]), pc.is_valid(t[label_col]))
        )
        return pa.table(
            {
                "score": t[score_col],
                "n": pa.array(np.ones(len(t), np.int64)),
                "pos": pc.cast(t[label_col], pa.int64()),
            }
        )

    hist = partial_sum_groupby(
        ds.map_batches(widen, batch_format="pyarrow"),
        ["score"], {"n": "n", "pos": "pos"},
    )

    def finish(t: pa.Table) -> pa.Table:
        t = t.sort_by("score")
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = t["pos"].to_numpy(zero_copy_only=False).astype(np.int64)
        cum_less = np.concatenate([[0], np.cumsum(n)[:-1]])
        s2 = int((pos * (2 * cum_less + n + 1)).sum())
        n1 = int(pos.sum())
        n0 = int(n.sum()) - n1
        if n1 == 0 or n0 == 0:
            raise ValueError("binary_auc: need both classes present")
        auc = (s2 - n1 * (n1 + 1)) / (2 * n1 * n0)
        return pa.table(
            {
                "auc": pa.array([auc], pa.float64()),
                "n_pos": pa.array([n1], pa.int64()),
                "n_neg": pa.array([n0], pa.int64()),
            }
        )

    # batch_size=None: finish needs the WHOLE histogram in one call — the
    # default 1024-row slicing would emit one wrong partial AUC per slice
    return hist.repartition(1).map_batches(
        finish, batch_format="pyarrow", batch_size=None
    )
