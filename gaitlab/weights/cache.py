"""Content-hashed Orbax cache for converted PyTorch checkpoints.

SURVEY.md §5 checkpoint plan: torch .pth/.ckpt files are converted once
(gaitlab.weights.torch_import) and the resulting flax variable pytree is
stored as an Orbax checkpoint keyed by the source file's content hash —
later runs skip torch deserialization and key remapping entirely.
"""

from __future__ import annotations

import hashlib
import os
import os.path as osp
from typing import Any, Callable, Optional

DEFAULT_CACHE_DIR = os.environ.get(
    "GAITLAB_WEIGHT_CACHE", osp.expanduser("~/.cache/gaitlab/weights"))


def file_hash(path: str, chunk: int = 1 << 20) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()[:16]


def _ckpt_dir(src_path: str, tag: str, cache_dir: Optional[str]) -> str:
    root = cache_dir or DEFAULT_CACHE_DIR
    return osp.join(root, f"{osp.basename(src_path)}.{tag}.{file_hash(src_path)}")


def save(variables: Any, path: str) -> None:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(osp.abspath(path), variables, force=True)
    ckptr.wait_until_finished()


def load(path: str, like: Any) -> Any:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(osp.abspath(path), target=like)


def memo_tree(cache_key: str, builder: Callable[[], Any],
              cache_dir: Optional[str] = None) -> Any:
    """Disk-memoise an arbitrary array pytree by a string key (e.g. random
    model-variable initialisation — eager flax init of the full GRNet costs
    minutes; restoring the cached tree takes seconds)."""
    root = cache_dir or DEFAULT_CACHE_DIR
    key = hashlib.sha256(cache_key.encode()).hexdigest()[:16]
    d = osp.join(root, f"memo.{key}")
    if osp.isdir(d):
        try:
            import orbax.checkpoint as ocp

            ckptr = ocp.StandardCheckpointer()
            return ckptr.restore(osp.abspath(d))  # target-free restore
        except Exception:
            pass
    tree = builder()
    try:
        os.makedirs(root, exist_ok=True)
        save(tree, d)
    except Exception as e:
        print(f"memo_tree cache write failed ({e}); continuing uncached")
    return tree


def convert_cached(
    src_path: str,
    like: Any,
    convert: Callable[[str, Any], Any],
    tag: str = "flax",
    cache_dir: Optional[str] = None,
) -> Any:
    """Return `convert(src_path, like)`, memoised by the source file's
    content hash in an Orbax checkpoint directory."""
    d = _ckpt_dir(src_path, tag, cache_dir)
    if osp.isdir(d):
        try:
            return load(d, like)
        except Exception:
            pass  # corrupt/stale cache entry -> reconvert
    variables = convert(src_path, like)
    try:
        os.makedirs(osp.dirname(d), exist_ok=True)
        save(variables, d)
    except Exception as e:  # cache is best-effort
        print(f"weight-cache write failed ({e}); continuing uncached")
    return variables
