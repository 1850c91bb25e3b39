"""Remote-asset helpers (reference demo_utils.py:88-157 roles).

The reference shells out to pytube/gdown/wget for YouTube clips and
checkpoint downloads. This environment is egress-free, so these helpers
resolve local caches/mirrors and fail with actionable messages instead of
hanging on network IO; set GAITLAB_ASSET_DIR to a directory of
pre-fetched files to satisfy lookups offline.
"""

from __future__ import annotations

import os
import os.path as osp
import shutil
from typing import Optional

ASSET_DIR = os.environ.get("GAITLAB_ASSET_DIR", "data")


def resolve_asset(name: str, asset_dir: Optional[str] = None) -> str:
    """Find `name` under the local asset directory (recursively)."""
    root = asset_dir or ASSET_DIR
    direct = osp.join(root, name)
    if osp.isfile(direct):
        return direct
    for dirpath, _, files in os.walk(root):
        if name in files:
            return osp.join(dirpath, name)
    raise FileNotFoundError(
        f"asset '{name}' not found under '{root}'. This build runs without "
        f"network egress; place the file there or set GAITLAB_ASSET_DIR.")


def download_youtube_clip(url: str, download_folder: str) -> str:
    """Reference demo_utils.download_youtube_clip(:88-102). Offline: only a
    local file path or pre-fetched asset is accepted."""
    if osp.isfile(url):
        os.makedirs(download_folder, exist_ok=True)
        dst = osp.join(download_folder, osp.basename(url))
        if osp.abspath(url) != osp.abspath(dst):
            shutil.copy(url, dst)
        return dst
    try:
        return resolve_asset(osp.basename(url))
    except FileNotFoundError:
        raise RuntimeError(
            f"cannot fetch '{url}': no network egress. Download the clip "
            f"elsewhere and pass its local path via --vid_file.")


def download_ckpt(outdir: str = "data/grnet_data",
                  name: str = "max-grnet.pth.tar") -> str:
    """Reference demo_utils.download_ckpt(:137-157). Offline resolution."""
    local = osp.join(outdir, name)
    if osp.isfile(local):
        return local
    return resolve_asset(name)
