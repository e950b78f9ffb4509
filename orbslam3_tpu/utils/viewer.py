"""Headless visualization: frame overlays and map renders to image files.

Role-parity with the reference's Viewer/FrameDrawer/MapDrawer
(/root/reference/src/Viewer.cc, FrameDrawer.cc, MapDrawer.cc) minus the
interactive Pangolin window (no display in this environment): FrameDrawer
overlays tracked keypoints/matches on the current image; MapDrawer renders
keyframe frusta, the covisibility graph, and map points; Viewer ties both
to a SLAM System and writes PNG frames to a directory (consumable as a
video or inspected per frame).
"""

from __future__ import annotations

import os

import numpy as np


class FrameDrawer:
    def __init__(self, system):
        self.system = system

    def draw(self, image: np.ndarray) -> np.ndarray:
        import cv2

        img = cv2.cvtColor(image, cv2.COLOR_GRAY2BGR)
        tracker = self.system.tracker
        f = tracker.current
        if f is None:
            return img
        for i in range(f.n):
            x, y = int(f.kps[i, 0]), int(f.kps[i, 1])
            mp = f.map_points[i]
            if mp is not None and not f.outlier[i]:
                cv2.rectangle(img, (x - 3, y - 3), (x + 3, y + 3), (0, 255, 0), 1)
                cv2.circle(img, (x, y), 1, (0, 255, 0), -1)
            else:
                cv2.circle(img, (x, y), 1, (120, 120, 120), -1)
        state = tracker.state.name
        stats = self.system.map_stats()
        txt = (
            f"{state}  KFs: {stats['n_keyframes']}  MPs: {stats['n_map_points']}"
            f"  inliers: {tracker.matches_inliers}"
        )
        cv2.putText(img, txt, (10, img.shape[0] - 10), cv2.FONT_HERSHEY_PLAIN, 1,
                    (255, 255, 255), 1)
        return img


class MapDrawer:
    def __init__(self, system):
        self.system = system

    def render(self, path: str):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        m = self.system.atlas.get_current_map()
        fig = plt.figure(figsize=(8, 6))
        ax = fig.add_subplot(111, projection="3d")
        mps = m.get_all_map_points()
        if mps:
            pts = np.stack([mp.position for mp in mps])
            ax.scatter(pts[:, 0], pts[:, 2], -pts[:, 1], s=0.5, c="k", alpha=0.4)
        kfs = m.get_all_keyframes()
        if kfs:
            centers = np.stack([kf.camera_center() for kf in kfs])
            ax.plot(centers[:, 0], centers[:, 2], -centers[:, 1], "b-", lw=1)
            ax.scatter(centers[:, 0], centers[:, 2], -centers[:, 1], s=8, c="b")
            # covisibility edges
            for kf in kfs:
                c0 = kf.camera_center()
                for nb in kf.get_best_covisibility_keyframes(3):
                    c1 = nb.camera_center()
                    ax.plot([c0[0], c1[0]], [c0[2], c1[2]], [-c0[1], -c1[1]],
                            "g-", lw=0.3, alpha=0.5)
        ax.set_xlabel("x")
        ax.set_ylabel("z")
        ax.set_zlabel("-y")
        fig.tight_layout()
        fig.savefig(path, dpi=110)
        plt.close(fig)


class Viewer:
    """Writes frame overlays + periodic map renders to out_dir."""

    def __init__(self, system, out_dir: str, map_every: int = 20):
        self.system = system
        self.out_dir = out_dir
        self.map_every = map_every
        self.frame_drawer = FrameDrawer(system)
        self.map_drawer = MapDrawer(system)
        self.count = 0
        os.makedirs(out_dir, exist_ok=True)

    def update(self, image: np.ndarray):
        import cv2

        img = self.frame_drawer.draw(image)
        cv2.imwrite(os.path.join(self.out_dir, f"frame_{self.count:05d}.png"), img)
        if self.count % self.map_every == 0:
            self.map_drawer.render(
                os.path.join(self.out_dir, f"map_{self.count:05d}.png")
            )
        self.count += 1
