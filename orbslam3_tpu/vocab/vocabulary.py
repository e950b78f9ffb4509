"""Binary bag-of-words vocabulary (DBoW2 TemplatedVocabulary<FORB> analog).

Role-parity with /root/reference/Thirdparty/DBoW2 as used through
include/ORBVocabulary.h:29: hierarchical k-medians tree over 256-bit ORB
descriptors, tf-idf weighted BoW vectors, feature vectors at a fixed tree
level for bucketed matching, L1 scoring, and a loader for the ORBvoc.txt
text format (TemplatedVocabulary::loadFromTextFile, :1338).

Not a port: the tree lives in flat NumPy arrays (children table + packed
descriptors) and `transform` descends ALL descriptors in lock-step with
vectorized Hamming argmins — one (N, k) popcount per level instead of
DBoW2's per-descriptor recursive walk.  Training uses k-medians with
majority-vote bit medians.
"""

from __future__ import annotations

import numpy as np

def _hamming(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(N, 32) x (M, 32) -> (N, M) int32."""
    return np.bitwise_count(a[:, None, :] ^ b[None, :, :]).sum(
        axis=-1, dtype=np.int32
    )


def _bit_median(descs: np.ndarray) -> np.ndarray:
    """Majority-vote per-bit median of (N, 32) uint8 descriptors."""
    bits = np.unpackbits(descs, axis=1)  # (N, 256)
    maj = (bits.sum(axis=0) * 2 >= len(descs)).astype(np.uint8)
    return np.packbits(maj)


class BinaryVocabulary:
    """k-ary tree of depth L; leaves are words with idf weights."""

    def __init__(self, k: int = 10, depth: int = 5, feat_level: int = 2):
        self.k = k
        self.depth = depth
        # feature-vector grouping level measured from the ROOT (DBoW2's
        # `levelsup` counts from the leaves; ORB-SLAM uses levelsup=4)
        self.feat_level = feat_level
        # flat arrays, node 0 = root
        self.children = np.zeros((1, k), np.int64) - 1
        self.node_desc = np.zeros((1, 32), np.uint8)
        self.node_level = np.zeros(1, np.int32)
        self.word_id = np.zeros(1, np.int64) - 1  # >= 0 at leaves
        self.weights = np.zeros(0, np.float64)    # per word (idf)
        self.n_words = 0

    # ------------------------------------------------------------------
    @staticmethod
    def train(
        descriptors: np.ndarray,
        k: int = 10,
        depth: int = 5,
        feat_level: int = 2,
        seed: int = 0,
        kmeans_iters: int = 8,
    ) -> "BinaryVocabulary":
        """Hierarchical k-medians over a (N, 32) uint8 training set."""
        rng = np.random.default_rng(seed)
        voc = BinaryVocabulary(k, depth, feat_level)
        children = [np.full(k, -1, np.int64)]
        node_desc = [np.zeros(32, np.uint8)]
        node_level = [0]
        word_of_node = [-1]
        leaf_counts = []

        def build(desc_idx: np.ndarray, node: int, level: int):
            descs = descriptors[desc_idx]
            if level == depth or len(desc_idx) <= k:
                word_of_node[node] = len(leaf_counts)
                leaf_counts.append(len(desc_idx))
                return
            # k-medians init: k distinct random seeds
            uniq = np.unique(descs, axis=0)
            kk = min(k, len(uniq))
            centers = uniq[rng.choice(len(uniq), kk, replace=False)]
            for _ in range(kmeans_iters):
                d = _hamming(descs, centers)
                assign = d.argmin(axis=1)
                new_centers = []
                for c in range(kk):
                    m = assign == c
                    new_centers.append(_bit_median(descs[m]) if m.any() else centers[c])
                new_centers = np.stack(new_centers)
                if (new_centers == centers).all():
                    break
                centers = new_centers
            d = _hamming(descs, centers)
            assign = d.argmin(axis=1)
            for c in range(kk):
                m = assign == c
                if not m.any():
                    continue
                child = len(children)
                children.append(np.full(k, -1, np.int64))
                node_desc.append(centers[c])
                node_level.append(level + 1)
                word_of_node.append(-1)
                children[node][c] = child
                build(desc_idx[m], child, level + 1)

        build(np.arange(len(descriptors)), 0, 0)
        voc.children = np.stack(children)
        voc.node_desc = np.stack(node_desc)
        voc.node_level = np.asarray(node_level, np.int32)
        voc.word_id = np.asarray(word_of_node, np.int64)
        voc.n_words = len(leaf_counts)
        # idf weights from the training corpus (treat all descs as one doc
        # set; DBoW2 uses per-image idf — with one synthetic corpus this is
        # the tf-idf-like weighting the scores need)
        counts = np.asarray(leaf_counts, np.float64)
        n = counts.sum()
        voc.weights = np.where(counts > 0, np.log(n / np.maximum(counts, 1)), 0.0)
        return voc

    # ------------------------------------------------------------------
    def transform(self, descriptors: np.ndarray):
        """(N, 32) -> (bow_vec: dict word->weight (L1-normalized),
                       feat_vec: dict node_at_feat_level -> list[int])."""
        n = len(descriptors)
        if n == 0:
            return {}, {}
        cur = np.zeros(n, np.int64)  # current node per descriptor
        feat_node = np.zeros(n, np.int64)
        for level in range(self.depth + 1):
            if level == self.feat_level:
                feat_node = cur.copy()
            ch = self.children[cur]                      # (N, k)
            has_child = (ch >= 0).any(axis=1)
            if not has_child.any():
                break
            idx = np.nonzero(has_child)[0]
            chi = ch[idx]                                # (M, k)
            cand = self.node_desc[np.maximum(chi, 0)]    # (M, k, 32)
            d = np.bitwise_count(cand ^ descriptors[idx][:, None, :]).sum(
                axis=-1, dtype=np.int32
            )
            d = np.where(chi >= 0, d, 1 << 20)
            cur[idx] = chi[np.arange(len(idx)), d.argmin(axis=1)]
        words = self.word_id[cur]
        # bow: per-word summed idf weight, L1-normalized (vectorized)
        wv = words[words >= 0]
        bow: dict[int, float] = {}
        if len(wv):
            uw, cnt = np.unique(wv, return_counts=True)
            wts = self.weights[uw] * cnt
            keep = self.weights[uw] > 0
            s = wts[keep].sum()
            if s > 0:
                bow = dict(
                    zip(uw[keep].tolist(), (wts[keep] / s).tolist())
                )
        # feat: node-at-feat-level -> ascending descriptor indices
        order = np.argsort(feat_node, kind="stable")
        fn = feat_node[order]
        bounds = np.nonzero(np.diff(fn))[0] + 1
        feat = {
            int(fn[s0]): order[s0:s1].tolist()
            for s0, s1 in zip(
                np.concatenate([[0], bounds]),
                np.concatenate([bounds, [n]]),
            )
        }
        return bow, feat

    @staticmethod
    def score(bow1: dict, bow2: dict) -> float:
        """DBoW2 L1 score in [0, 1]: 1 - 0.5*sum|v1 - v2| over the union."""
        if not bow1 or not bow2:
            return 0.0
        s = 0.0
        for w, v in bow1.items():
            u = bow2.get(w)
            if u is not None:
                s += abs(v - u) - abs(v) - abs(u)
        return -0.5 * s

    # ------------------------------------------------------------------
    def save(self, path: str):
        np.savez_compressed(
            path,
            k=self.k,
            depth=self.depth,
            feat_level=self.feat_level,
            children=self.children,
            node_desc=self.node_desc,
            node_level=self.node_level,
            word_id=self.word_id,
            weights=self.weights,
        )

    @staticmethod
    def load(path: str) -> "BinaryVocabulary":
        z = np.load(path)
        voc = BinaryVocabulary(int(z["k"]), int(z["depth"]), int(z["feat_level"]))
        voc.children = z["children"]
        voc.node_desc = z["node_desc"]
        voc.node_level = z["node_level"]
        voc.word_id = z["word_id"]
        voc.weights = z["weights"]
        voc.n_words = int((voc.word_id >= 0).sum())
        return voc

    # --- ORBvoc.txt compatibility ----------------------------------------
    @staticmethod
    def load_orbvoc_text(path: str, feat_level: int = 2) -> "BinaryVocabulary":
        """Parse the DBoW2 text format the reference ships (header
        `k L scoring weighting`, then one node per line:
        `parent_id is_leaf d0..d31 weight`, nodes in BFS order)."""
        with open(path) as f:
            header = f.readline().split()
            k, depth = int(header[0]), int(header[1])
            parents, leafs, descs, wts = [], [], [], []
            for line in f:
                parts = line.split()
                if len(parts) < 35:
                    continue
                parents.append(int(parts[0]))
                leafs.append(int(parts[1]) != 0)
                descs.append([int(x) for x in parts[2:34]])
                wts.append(float(parts[34]))
        n = len(parents) + 1  # + root
        voc = BinaryVocabulary(k, depth, feat_level)
        voc.children = np.full((n, k), -1, np.int64)
        voc.node_desc = np.zeros((n, 32), np.uint8)
        voc.node_level = np.zeros(n, np.int32)
        voc.word_id = np.full(n, -1, np.int64)
        weights = []
        child_count = np.zeros(n, np.int64)
        for i in range(n - 1):
            node = i + 1
            p = parents[i] + 0  # text ids are 0-based with root=0
            slot = child_count[p]
            if slot < k:
                voc.children[p, slot] = node
                child_count[p] += 1
            voc.node_desc[node] = np.asarray(descs[i], np.uint8)
            voc.node_level[node] = voc.node_level[p] + 1
            if leafs[i]:
                voc.word_id[node] = len(weights)
                weights.append(wts[i])
        voc.weights = np.asarray(weights, np.float64)
        voc.n_words = len(weights)
        return voc

    def save_orbvoc_text(self, path: str):
        """Write the DBoW2-compatible text format (BFS order; node ids are
        implicit: root = 0, line i defines node i+1; parent field is the
        parent's id)."""
        lines = [f"{self.k} {self.depth} 0 0\n"]
        new_id = {0: 0}
        queue = [0]
        order = []
        while queue:
            node = queue.pop(0)
            for c in self.children[node]:
                if c >= 0:
                    new_id[int(c)] = len(order) + 1
                    order.append((int(c), new_id[node]))
                    queue.append(int(c))
        for node, parent_id in order:
            is_leaf = int(self.word_id[node] >= 0)
            w = self.weights[self.word_id[node]] if is_leaf else 0.0
            d = " ".join(str(int(x)) for x in self.node_desc[node])
            lines.append(f"{parent_id} {is_leaf} {d} {w:.6f}\n")
        with open(path, "w") as f:
            f.writelines(lines)
