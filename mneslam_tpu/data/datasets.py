"""Dataset loaders: Replica, ScanNet, Indoor (INS), Outdoor, TUM, synthetic.

Rebuild of `/root/reference/datasets/dataset.py` without the torch
dependency: plain numpy + cv2. Each item is the same dict contract —
{frame_id, c2w [4,4] float32 (OpenGL, -z forward), rgb [H,W,3] in [0,1],
depth [H,W] meters, direction [H,W,3] camera rays} — with per-agent
`start_index`/`end_index` windowing for trajectory splits.

Pose conventions are preserved exactly: Replica/ScanNet/Outdoor flip the
Y/Z columns of the stored c2w; Indoor additionally applies its fixed world
alignment transform before the flips and scales depth by 100/65535.
"""

from __future__ import annotations

import glob
import os
from typing import Dict, List, Optional

import numpy as np

from .rays import get_camera_rays
from .synthetic import SyntheticBoxDataset


def _imread_color(path: str) -> np.ndarray:
    import cv2

    img = cv2.imread(path)
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0


def _imread_depth(path: str) -> np.ndarray:
    import cv2

    return cv2.imread(path, cv2.IMREAD_UNCHANGED).astype(np.float32)


def _resize_color(img: np.ndarray, W: int, H: int) -> np.ndarray:
    import cv2

    return cv2.resize(img, (W, H))


class BaseDataset:
    def __init__(self, cfg):
        self.cfg = cfg
        down = cfg["data"].get("downsample", 1)
        self.png_depth_scale = cfg["cam"]["png_depth_scale"]
        self.H = cfg["cam"]["H"] // down
        self.W = cfg["cam"]["W"] // down
        self.fx = cfg["cam"]["fx"] // down if down > 1 else cfg["cam"]["fx"]
        self.fy = cfg["cam"]["fy"] // down if down > 1 else cfg["cam"]["fy"]
        self.cx = cfg["cam"]["cx"] // down if down > 1 else cfg["cam"]["cx"]
        self.cy = cfg["cam"]["cy"] // down if down > 1 else cfg["cam"]["cy"]
        self.crop_edge = cfg["cam"].get("crop_edge", 0)
        self.distortion = (np.asarray(cfg["cam"]["distortion"], np.float64)
                           if "distortion" in cfg["cam"] else None)
        self.sc_factor = cfg["data"].get("sc_factor", 1)
        self.t0 = cfg.get("start_index", 0)
        self.t1 = cfg.get("end_index", -1)
        if self.t1 == -1:
            self.t1 = None
        self.rays_d: Optional[np.ndarray] = None
        total = (self.H - 2 * self.crop_edge) * (self.W - 2 * self.crop_edge)
        self.num_rays_to_save = int(total * cfg["mapping"]["n_pixels"])

    def _directions(self) -> np.ndarray:
        if self.rays_d is None:
            self.rays_d = np.asarray(
                get_camera_rays(self.H, self.W, self.fx, self.fy, self.cx, self.cy),
                np.float32,
            )
        return self.rays_d

    def __len__(self):
        return self.num_frames

    def _undistort(self, rgb: np.ndarray) -> np.ndarray:
        """cv2.undistort on the COLOR image only (never depth), applied at
        raw resolution before any resize — dataset.py:99-101 /
        dataset_track.py:95-99. No-op without cam.distortion."""
        if self.distortion is None:
            return rgb
        import cv2

        K = np.eye(3)
        K[0, 0], K[0, 2], K[1, 1], K[1, 2] = self.fx, self.cx, self.fy, self.cy
        return cv2.undistort(rgb, K, self.distortion)

    def _item(self, index, rgb, depth, c2w) -> Dict:
        return {
            "frame_id": index,
            "c2w": np.asarray(c2w, np.float32),
            "rgb": rgb.astype(np.float32),
            "depth": depth.astype(np.float32),
            "direction": self._directions(),
        }


class ReplicaDataset(BaseDataset):
    """Replica (dataset.py:60-145): results/frame*.jpg + depth*.png + traj.txt."""

    def __init__(self, cfg, basedir):
        super().__init__(cfg)
        self.basedir = basedir
        self.img_files = sorted(glob.glob(f"{basedir}/results/frame*.jpg"))[self.t0:self.t1]
        self.depth_paths = sorted(glob.glob(f"{basedir}/results/depth*.png"))[self.t0:self.t1]
        self.poses = self._load_poses(os.path.join(basedir, "traj.txt"))
        self.frame_ids = list(range(len(self.img_files)))
        self.num_frames = len(self.img_files)

    def _load_poses(self, path) -> List[np.ndarray]:
        with open(path) as f:
            lines = f.readlines()[self.t0:self.t1]
        poses = []
        for i in range(self.num_frames if hasattr(self, "num_frames") else len(self.img_files)):
            c2w = np.asarray(list(map(float, lines[i].split())), np.float64).reshape(4, 4)
            c2w[:3, 1] *= -1
            c2w[:3, 2] *= -1
            c2w[:3, 3] *= self.sc_factor
            poses.append(c2w.astype(np.float32))
        return poses

    def __getitem__(self, index):
        rgb = self._undistort(_imread_color(self.img_files[index]))
        depth = _imread_depth(self.depth_paths[index]) / self.png_depth_scale * self.sc_factor
        H, W = depth.shape
        rgb = _resize_color(rgb, W, H)
        return self._item(self.frame_ids[index], rgb, depth, self.poses[index])


class ScannetDataset(BaseDataset):
    """ScanNet (dataset.py:148-247): color/*.jpg, depth/*.png, pose/*.txt."""

    def __init__(self, cfg, basedir):
        super().__init__(cfg)
        self.basedir = basedir
        key = lambda x: int(os.path.basename(x).split(".")[0])
        self.img_files = sorted(glob.glob(os.path.join(basedir, "color", "*.jpg")), key=key)[self.t0:self.t1]
        self.depth_paths = sorted(glob.glob(os.path.join(basedir, "depth", "*.png")), key=key)[self.t0:self.t1]
        pose_paths = sorted(glob.glob(os.path.join(basedir, "pose", "*.txt")), key=key)[self.t0:self.t1]
        self.poses = []
        for p in pose_paths:
            c2w = np.loadtxt(p).reshape(4, 4)
            c2w[:3, 1] *= -1
            c2w[:3, 2] *= -1
            self.poses.append(c2w.astype(np.float32))
        self.frame_ids = list(range(len(self.img_files)))
        self.num_frames = len(self.img_files)
        if self.crop_edge > 0:
            self.H -= 2 * self.crop_edge
            self.W -= 2 * self.crop_edge
            self.cx -= self.crop_edge
            self.cy -= self.crop_edge

    def __getitem__(self, index):
        rgb = self._undistort(_imread_color(self.img_files[index]))
        depth = _imread_depth(self.depth_paths[index]) / self.png_depth_scale * self.sc_factor
        H, W = depth.shape
        rgb = _resize_color(rgb, W, H)
        e = self.crop_edge
        if e > 0:
            rgb = rgb[e:-e, e:-e]
            depth = depth[e:-e, e:-e]
        return self._item(self.frame_ids[index], rgb, depth, self.poses[index])


class IndoorDataset(BaseDataset):
    """INS indoor (dataset.py:339-434): depth_holefilling PNGs scaled by
    100/65535, poses pre-multiplied by the fixed world alignment."""

    WORLD_ALIGN = np.asarray(
        [[0.970296, -0.241922, 0.0, -0.789423],
         [0.241922, 0.970296, 0.0, -6.085402],
         [0.0, 0.0, 1.0, 0.0],
         [0.0, 0.0, 0.0, 1.0]]
    )

    def __init__(self, cfg, basedir):
        super().__init__(cfg)
        self.basedir = basedir
        self.img_files = sorted(glob.glob(os.path.join(basedir, "color", "*.jpg")))[self.t0:self.t1]
        self.depth_paths = sorted(
            glob.glob(os.path.join(basedir, "depth_holefilling", "*.png")))[self.t0:self.t1]
        with open(os.path.join(basedir, "traj.txt")) as f:
            lines = f.readlines()[self.t0:self.t1]
        self.poses = []
        for line in lines:
            c2w = np.asarray(list(map(float, line.split())), np.float64).reshape(4, 4)
            c2w = self.WORLD_ALIGN @ c2w
            c2w[:3, 1] *= -1
            c2w[:3, 2] *= -1
            self.poses.append(c2w.astype(np.float32))
        self.frame_ids = list(range(len(self.img_files)))
        self.num_frames = len(self.img_files)
        if self.crop_edge > 0:
            self.H -= 2 * self.crop_edge
            self.W -= 2 * self.crop_edge
            self.cx -= self.crop_edge
            self.cy -= self.crop_edge

    def __getitem__(self, index):
        rgb = self._undistort(_imread_color(self.img_files[index]))
        depth = _imread_depth(self.depth_paths[index]) / 65535.0 * 100.0
        H, W = depth.shape
        rgb = _resize_color(rgb, W, H)
        e = self.crop_edge
        if e > 0:
            rgb = rgb[e:-e, e:-e]
            depth = depth[e:-e, e:-e]
        return self._item(self.frame_ids[index], rgb, depth, self.poses[index])


class OutdoorDataset(ReplicaDataset):
    """Outdoor (dataset.py:252-337): Replica layout, no index window."""

    def __init__(self, cfg, basedir):
        cfg = dict(cfg)
        cfg.setdefault("start_index", 0)
        cfg.setdefault("end_index", -1)
        super().__init__(cfg, basedir)

    def __getitem__(self, index):
        rgb = self._undistort(_imread_color(self.img_files[index]))
        depth = _imread_depth(self.depth_paths[index]) / self.png_depth_scale * self.sc_factor
        H = rgb.shape[0]
        W = rgb.shape[1]
        import cv2

        depth = cv2.resize(depth, (W, H))
        return self._item(self.frame_ids[index], rgb, depth, self.poses[index])


class TUMDataset(BaseDataset):
    """TUM RGB-D (BASELINE config #3): rgb.txt/depth.txt/groundtruth.txt with
    greedy timestamp association."""

    def __init__(self, cfg, basedir, max_dt: float = 0.08):
        super().__init__(cfg)
        self.basedir = basedir

        def read_list(name):
            rows = []
            with open(os.path.join(basedir, name)) as f:
                for line in f:
                    if line.startswith("#") or not line.strip():
                        continue
                    parts = line.split()
                    rows.append((float(parts[0]), parts[1:]))
            return rows

        rgb_list = read_list("rgb.txt")
        depth_list = read_list("depth.txt")
        gt_list = read_list("groundtruth.txt")

        d_ts = np.asarray([t for t, _ in depth_list])
        g_ts = np.asarray([t for t, _ in gt_list])

        self.img_files, self.depth_paths, self.poses, self.timestamps = [], [], [], []
        from ..ops import lie
        import jax.numpy as jnp

        for t, (rgb_path,) in rgb_list:
            di = int(np.argmin(np.abs(d_ts - t)))
            gi = int(np.argmin(np.abs(g_ts - t)))
            if abs(d_ts[di] - t) > max_dt or abs(g_ts[gi] - t) > max_dt:
                continue
            tx, ty, tz, qx, qy, qz, qw = map(float, gt_list[gi][1][:7])
            R = np.asarray(lie.quat_to_matrix(jnp.asarray([qx, qy, qz, qw])))
            c2w = np.eye(4, dtype=np.float64)
            c2w[:3, :3] = R
            c2w[:3, 3] = [tx, ty, tz]
            c2w[:3, 1] *= -1
            c2w[:3, 2] *= -1
            self.img_files.append(os.path.join(basedir, rgb_path))
            self.depth_paths.append(os.path.join(basedir, depth_list[di][1][0]))
            self.poses.append(c2w.astype(np.float32))
            self.timestamps.append(t)

        sl = slice(self.t0, self.t1)
        self.img_files = self.img_files[sl]
        self.depth_paths = self.depth_paths[sl]
        self.poses = self.poses[sl]
        self.timestamps = self.timestamps[sl]
        self.frame_ids = list(range(len(self.img_files)))
        self.num_frames = len(self.img_files)

    def __getitem__(self, index):
        rgb = self._undistort(_imread_color(self.img_files[index]))
        depth = _imread_depth(self.depth_paths[index]) / self.png_depth_scale * self.sc_factor
        H, W = depth.shape
        rgb = _resize_color(rgb, W, H)
        return self._item(self.frame_ids[index], rgb, depth, self.poses[index])


def get_dataset(config):
    """Factory keyed on cfg['dataset'] (dataset.py:12-33)."""
    name = config["dataset"]
    if name == "synthetic":
        return SyntheticBoxDataset(config, num_frames=config["data"].get("num_frames", 24))
    basedir = config["data"]["datadir"]
    return {
        "replica": ReplicaDataset,
        "scannet": ScannetDataset,
        "indoor": IndoorDataset,
        "outdoor": OutdoorDataset,
        "tum": TUMDataset,
    }[name](config, basedir)
