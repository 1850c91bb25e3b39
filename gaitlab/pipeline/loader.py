"""Host frame loader: native C++ batch decoder + prefetch pipeline.

The reference feeds the model from torch DataLoader worker *processes*
doing per-frame cv2.imread + warpAffine (/root/reference/demo.py:149,
lib/dataset/inference.py:71-87). Here decode is a C++ thread pool
(gaitlab/native/loader.cc, GIL released, libpng/libjpeg) writing straight
into a reusable buffer, and `PrefetchLoader` overlaps chunk i+1's decode
with chunk i's device compute — the double-buffered host feed from
SURVEY.md §7 step 10. Falls back to cv2 when the toolchain is missing.
"""

from __future__ import annotations

import os
import os.path as osp
import queue
import subprocess
import sys
import sysconfig
import threading
from typing import Iterator, Optional, Sequence

import numpy as np

_NATIVE_DIR = osp.join(osp.dirname(__file__), "..", "native")
_SRC = osp.abspath(osp.join(_NATIVE_DIR, "loader.cc"))
_mod = None
_mod_failed = False


def _build_dir() -> str:
    d = os.environ.get("GAITLAB_BUILD_DIR",
                       osp.expanduser("~/.cache/gaitlab/native"))
    os.makedirs(d, exist_ok=True)
    return d


def _native():
    """Compile (once) and import the _gaitloader extension; None if the
    toolchain or codec libraries are unavailable."""
    global _mod, _mod_failed
    if _mod is not None or _mod_failed:
        return _mod
    try:
        import hashlib
        import importlib.util

        tag = hashlib.sha256(open(_SRC, "rb").read()).hexdigest()[:12]
        so = osp.join(_build_dir(), f"_gaitloader_{tag}.so")
        if not osp.isfile(so):
            cmd = [
                "g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
                "-o", so + ".tmp",
                f"-I{sysconfig.get_paths()['include']}",
                "-lpng", "-ljpeg", "-pthread",
            ]
            subprocess.run(cmd, check=True, capture_output=True)
            os.replace(so + ".tmp", so)
        spec = importlib.util.spec_from_file_location("_gaitloader", so)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        _mod = mod
    except Exception as e:
        print(f"native loader unavailable ({e}); falling back to cv2",
              file=sys.stderr)
        _mod_failed = True
    return _mod


def image_size(path: str) -> tuple[int, int]:
    mod = _native()
    if mod is not None:
        return tuple(mod.image_size(path))
    import cv2

    img = cv2.imread(path)
    if img is None:
        raise FileNotFoundError(path)
    return img.shape[0], img.shape[1]


def load_frames(paths: Sequence[str], n_threads: int = 16,
                out: Optional[np.ndarray] = None) -> np.ndarray:
    """Decode a batch of same-size images -> (N, H, W, 3) uint8 RGB."""
    paths = list(paths)
    if not paths:
        raise ValueError("empty path list")
    mod = _native()
    if mod is None:
        from gaitlab.pipeline.video import load_frames as cv2_load

        return cv2_load(paths)
    h, w = image_size(paths[0])
    if out is None or out.shape != (len(paths), h, w, 3):
        out = np.empty((len(paths), h, w, 3), np.uint8)
    mod.decode_batch(paths, memoryview(out).cast("B"), h, w, n_threads)
    return out


class PrefetchLoader:
    """Iterate (chunk_paths -> decoded frames) with one-chunk lookahead on
    a worker thread, so host decode overlaps device compute."""

    def __init__(self, paths: Sequence[str], chunk: int = 32,
                 n_threads: int = 16):
        self.paths = list(paths)
        self.chunk = chunk
        self.n_threads = n_threads

    def __len__(self):
        return -(-len(self.paths) // self.chunk)

    def __iter__(self) -> Iterator[np.ndarray]:
        q: queue.Queue = queue.Queue(maxsize=2)
        stop = threading.Event()

        def worker():
            try:
                for s in range(0, len(self.paths), self.chunk):
                    if stop.is_set():
                        return
                    frames = load_frames(
                        self.paths[s : s + self.chunk],
                        n_threads=self.n_threads)
                    q.put(frames)
                q.put(None)
            except Exception as e:  # surface in consumer
                q.put(e)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
