"""Pure-numpy oracle mirroring the reference C++ fitter sample-by-sample.

This is an independent, deliberately naive re-implementation of the exact
algorithms in /root/reference/gbrl/src/cpp (fitter.cpp, node.cpp,
split_candidate_generator.cpp, math_ops.h) used ONLY to validate the
vectorized JAX fitter.  It follows the scalar control flow literally:
per-node sample lists, per-candidate partitioning, the literal cosine
numerator/denominator form (math_ops.h:538-576), DFS stack order, strict->
argmax tie-breaking, the no-reuse-on-path rule and the >=0 greedy acceptance
rule.
"""
from __future__ import annotations

import numpy as np

NEG_INF = -np.inf


def uniform_candidates_np(X, n_bins):
    """split_candidate_generator.cpp:59-76."""
    F = X.shape[1]
    cands = []
    for f in range(F):
        mn, mx = X[:, f].min(), X[:, f].max()
        step = (mx - mn) / n_bins
        for b in range(n_bins):
            cands.append((f, np.float32(mn + b * step)))
    return cands


def quantile_candidates_np(X, n_bins):
    """split_candidate_generator.cpp:216-249 (dedup inert, duplicates kept)."""
    N, F = X.shape
    actual_bins = n_bins + 1
    spb = N // actual_bins
    rem = N % actual_bins
    bin_counts = [spb + (1 if i < rem else 0) for i in range(actual_bins)]
    cands = []
    for f in range(F):
        order = np.argsort(X[:, f], kind="stable")
        cum = 0
        for i in range(n_bins):
            cum += bin_counts[i]
            cands.append((f, np.float32(X[order[min(cum - 1, N - 1)], f])))
    return cands


def _partition(idx, X, f, v):
    xv = X[idx, f]
    right = idx[xv > v]
    left = idx[~(xv > v)]
    return left, right


def _partition_cat(idx, Xc, f, c):
    xv = Xc[idx, f]
    right = idx[xv == c]
    left = idx[~(xv == c)]
    return left, right


def _split_score_generic(idx, X, Xc, g, cand, score, min_data):
    """cand = ('num', f, v) | ('cat', f, code); node.cpp:64-97 routing."""
    kind, f, v = cand
    if kind == 'num':
        left, right = _partition(idx, X, f, v)
    else:
        left, right = _partition_cat(idx, Xc, f, v)
    nl, nr = len(left), len(right)
    if nl < min_data or nr < min_data:
        return NEG_INF
    ml = g[left].sum(axis=0) / nl if nl > 0 else np.zeros(g.shape[1])
    mr = g[right].sum(axis=0) / nr if nr > 0 else np.zeros(g.shape[1])
    if score == "l2":
        return nl * (ml @ ml) + nr * (mr @ mr)
    num = (g[right] @ mr).sum() if nr > 0 else 0.0
    num += (g[left] @ ml).sum() if nl > 0 else 0.0
    den = (mr @ mr) * nr + (ml @ ml) * nl
    if den == 0.0:
        return 0.0
    return num / np.sqrt(den)


def categorical_candidates_np(Xc, grad_norms, n_bins):
    """split_candidate_generator.cpp:117-163: all (feature, code) pairs, or
    the top n_cat*n_bins by average gradient norm when more are present."""
    N, Fc = Xc.shape
    stats = {}
    for f in range(Fc):
        for i in range(N):
            key = (f, int(Xc[i, f]))
            tot, cnt = stats.get(key, (0.0, 0))
            stats[key] = (tot + grad_norms[i], cnt + 1)
    pairs = [(k, tot / cnt) for k, (tot, cnt) in stats.items()]
    limit = Fc * n_bins
    if len(pairs) > limit:
        pairs = sorted(pairs, key=lambda kv: -kv[1])[:limit]
    # deterministic (feature, code) order to match the dense-grid argmax
    keys = sorted(k for k, _ in pairs)
    return [('cat', f, c) for (f, c) in keys]


def fit_tree_oracle_mixed(X, Xc, grads, build_grads, cands, cfg, feat_w,
                          feat_w_cat):
    """Like fit_tree_oracle but with mixed numeric+categorical candidates.
    cands: list of ('num', f, v) and ('cat', f, code), numeric first."""
    N = grads.shape[0]
    D = cfg["max_depth"]
    score = cfg["score"]
    min_data = cfg["min_data_in_leaf"]
    root = OracleNode(np.arange(N), 0, [])

    def fw_of(cand):
        return feat_w[cand[1]] if cand[0] == 'num' else feat_w_cat[cand[1]]

    def on_path(path, cand):
        return any(pc == cand for pc in path)

    def part(idx, cand):
        if cand[0] == 'num':
            return _partition(idx, X, cand[1], cand[2])
        return _partition_cat(idx, Xc, cand[1], cand[2])

    if cfg["grow_policy"] == "greedy":
        stack = [root]
        while stack:
            node = stack.pop()
            to_split = not (node.depth == D or len(node.idx) == 0
                            or len(cands) == 0)
            best, chosen = NEG_INF, -1
            if to_split:
                parent = 0.0 if node.depth == 0 else _node_score(
                    node.idx, build_grads, score)
                for j, cand in enumerate(cands):
                    if on_path(node.path, cand):
                        s = NEG_INF
                    else:
                        s = _split_score_generic(node.idx, X, Xc, build_grads,
                                                 cand, score, min_data)
                    s = s * fw_of(cand) - parent
                    if s > best:
                        best, chosen = s, j
            if to_split and best >= 0:
                cand = cands[chosen]
                left, right = part(node.idx, cand)
                node.f, node.v = cand, None
                node.left = OracleNode(left, node.depth + 1,
                                       node.path + [cand])
                node.right = OracleNode(right, node.depth + 1,
                                        node.path + [cand])
                stack.append(node.right)
                stack.append(node.left)
            else:
                node.value = (grads[node.idx].mean(axis=0)
                              if len(node.idx) > 0
                              else np.zeros(grads.shape[1]))
    else:
        level = [root]
        depth = 0
        while depth < D:
            best, chosen = NEG_INF, -1
            for j, cand in enumerate(cands):
                total = 0.0
                for node in level:
                    if on_path(node.path, cand):
                        s = NEG_INF
                    else:
                        s = _split_score_generic(node.idx, X, Xc, build_grads,
                                                 cand, score, min_data)
                    total += s
                total *= fw_of(cand)
                if total > best:
                    best, chosen = total, j
            if best == NEG_INF:
                break
            cand = cands[chosen]
            nxt = []
            for node in level:
                left, right = part(node.idx, cand)
                node.f, node.v = cand, None
                node.left = OracleNode(left, depth + 1, node.path + [cand])
                node.right = OracleNode(right, depth + 1, node.path + [cand])
                nxt += [node.left, node.right]
            level = nxt
            depth += 1
        for node in level:
            node.value = (grads[node.idx].mean(axis=0)
                          if len(node.idx) > 0 else np.zeros(grads.shape[1]))
    return root


def tree_leaf_values_per_sample_mixed(root, X, Xc):
    N = X.shape[0] if X is not None else Xc.shape[0]
    out = None
    for i in range(N):
        node = root
        while node.value is None:
            kind, f, v = node.f
            if kind == 'num':
                go = X[i, f] > v
            else:
                go = Xc[i, f] == v
            node = node.right if go else node.left
        if out is None:
            out = np.zeros((N, len(node.value)))
        out[i] = node.value
    return out


def _split_score(idx, X, g, f, v, score, min_data):
    """node.cpp:187-376 literal form."""
    left, right = _partition(idx, X, f, v)
    nl, nr = len(left), len(right)
    if nl < min_data or nr < min_data:
        return NEG_INF
    ml = g[left].sum(axis=0) / nl if nl > 0 else np.zeros(g.shape[1])
    mr = g[right].sum(axis=0) / nr if nr > 0 else np.zeros(g.shape[1])
    if score == "l2":
        return nl * (ml @ ml) + nr * (mr @ mr)
    # cosine (math_ops.h:538-576)
    num = (g[right] @ mr).sum() if nr > 0 else 0.0
    num += (g[left] @ ml).sum() if nl > 0 else 0.0
    den = (mr @ mr) * nr + (ml @ ml) * nl
    if den == 0.0:
        return 0.0
    return num / np.sqrt(den)


def _node_score(idx, g, score):
    """split_candidate_generator.cpp:262-320."""
    n = len(idx)
    if n == 0:
        return 0.0  # never used by the reference (to_split is false first)
    mean = g[idx].mean(axis=0)
    if score == "l2":
        return n * (mean @ mean)
    sum_dot = (g[idx] @ mean).sum()
    den = (mean @ mean) * n
    if den == 0.0:
        return 0.0
    return sum_dot / np.sqrt(den)


def _on_path(path, f, v):
    """node.cpp:153-166: same feature AND same value as an ancestor."""
    return any(pf == f and pv == v for pf, pv in path)


class OracleNode:
    def __init__(self, idx, depth, path):
        self.idx = idx
        self.depth = depth
        self.path = path          # list of (f, v)
        self.left = None
        self.right = None
        self.f = None
        self.v = None
        self.value = None


def fit_tree_oracle(X, grads, build_grads, cands, cfg, feat_w):
    """One reference tree. cfg: dict with max_depth, min_data_in_leaf,
    grow_policy, score. Returns root OracleNode; leaves carry mean raw grads."""
    N = X.shape[0]
    D = cfg["max_depth"]
    score = cfg["score"]
    min_data = cfg["min_data_in_leaf"]
    root = OracleNode(np.arange(N), 0, [])

    if cfg["grow_policy"] == "greedy":
        # DFS stack (fitter.cpp:292-371); traversal order does not affect
        # the result since each node decides independently.
        stack = [root]
        while stack:
            node = stack.pop()
            to_split = not (node.depth == D or len(node.idx) == 0
                            or len(cands) == 0)
            best, chosen = NEG_INF, -1
            if to_split:
                parent = 0.0 if node.depth == 0 else _node_score(
                    node.idx, build_grads, score)
                for j, (f, v) in enumerate(cands):
                    if _on_path(node.path, f, v):
                        s = NEG_INF
                    else:
                        s = _split_score(node.idx, X, build_grads, f, v,
                                         score, min_data)
                    s = s * feat_w[f] - parent
                    if s > best:
                        best, chosen = s, j
            if to_split and best >= 0:
                f, v = cands[chosen]
                left, right = _partition(node.idx, X, f, v)
                node.f, node.v = f, v
                node.left = OracleNode(left, node.depth + 1,
                                       node.path + [(f, v)])
                node.right = OracleNode(right, node.depth + 1,
                                        node.path + [(f, v)])
                stack.append(node.right)
                stack.append(node.left)
            else:
                node.value = (grads[node.idx].mean(axis=0)
                              if len(node.idx) > 0
                              else np.zeros(grads.shape[1]))
    else:
        # oblivious (fitter.cpp:377-484)
        level = [root]
        depth = 0
        while depth < D:
            best, chosen = NEG_INF, -1
            for j, (f, v) in enumerate(cands):
                total = 0.0
                for node in level:
                    if _on_path(node.path, f, v):
                        s = NEG_INF
                    else:
                        s = _split_score(node.idx, X, build_grads, f, v,
                                         score, min_data)
                    total += s
                total *= feat_w[f]
                if total > best:
                    best, chosen = total, j
            if best == NEG_INF:
                break
            f, v = cands[chosen]
            nxt = []
            for node in level:
                left, right = _partition(node.idx, X, f, v)
                node.f, node.v = f, v
                node.left = OracleNode(left, depth + 1, node.path + [(f, v)])
                node.right = OracleNode(right, depth + 1, node.path + [(f, v)])
                nxt += [node.left, node.right]
            level = nxt
            depth += 1
        for node in level:
            node.value = (grads[node.idx].mean(axis=0)
                          if len(node.idx) > 0 else np.zeros(grads.shape[1]))
    return root


def tree_leaf_values_per_sample(root, X):
    """Route every sample; return [N, O] of its leaf's value."""
    N = X.shape[0]
    out = None
    for i in range(N):
        node = root
        while node.value is None:
            node = node.right if X[i, node.f] > node.v else node.left
        if out is None:
            out = np.zeros((N, len(node.value)))
        out[i] = node.value
    return out


def sgd_predict_oracle(per_tree_values, bias, lrs):
    """preds = bias - sum_t lr[t] * V[:, t, :] (optimizer.cpp:110-118)."""
    pred = np.broadcast_to(bias, per_tree_values[0].shape).copy()
    for t, V in enumerate(per_tree_values):
        pred = pred - lrs[t] * V
    return pred
