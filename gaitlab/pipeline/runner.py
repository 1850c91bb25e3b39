"""Track-level inference driver: host decode -> device crop -> bucketed
jitted GRNet -> numpy outputs.

This replaces the reference's Inference dataset + DataLoader + python batch
loop (/root/reference/demo.py:130-188, lib/dataset/inference.py) with a
TPU-shaped pipeline:

  * frames stream from disk (or memory) in fixed-size ingest chunks;
  * crop + resample + ImageNet-normalize run on device
    (gaitlab.pipeline.crop), fused by XLA;
  * the model runs at a small set of static batch sizes ("buckets") with
    tail padding, so variable-length tracks never trigger recompilation
    (SURVEY.md §7 hard part #3);
  * optional jax.sharding mesh: the frame batch is sharded over the
    "data" axis, params replicated — pure DP inference where the only
    collective is the output all-gather GSPMD inserts.
"""

from __future__ import annotations

import bisect
from dataclasses import dataclass, field
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from gaitlab.nn.grnet import GRNet, vp_regress
from gaitlab.pipeline import crop as crop_mod

DEFAULT_BUCKETS = (32, 64, 128, 256, 450)


@dataclass
class GRNetRunner:
    model: GRNet
    buckets: Optional[Sequence[int]] = None  # None -> $GAITLAB_BUCKETS or default
    crop_size: int = 224
    bbox_scale: float = 1.0  # reference demo.py:80 (bbox_scale = 1.0)
    ingest_chunk: int = 32   # full-res frames staged to device at once
    mesh: Optional[jax.sharding.Mesh] = None
    # matmul precision (jax.default_matmul_precision name). The default
    # "high" (bf16_3x on TPU) is the accuracy-qualified production mode:
    # 0.24 mm MPJPE vs the f32 torch reference in the worst-case
    # random-weight regime at 1.8x the float32 throughput
    # (scripts/precision_study.py, docs/PRECISION.json). "float32"
    # (bf16_6x) is exact parity (0.002 mm); "default" single-pass bf16
    # compounds ~14 mm through the ~100-conv stack and is NOT within the
    # 0.5 mm budget (SURVEY.md §7 hard part #4).
    precision: str = "high"
    # trunk compute dtype: "bfloat16" halves activation HBM traffic for the
    # conv trunk (params cast in-graph; SMPL + regression stay f32). Fast
    # mode — NOT the parity path.
    trunk_dtype: Optional[str] = None
    # Where the affine crop runs. "device": full-res frames ship to the
    # accelerator and the warp+normalize fuse into one XLA program (best
    # on locally-attached TPUs). "host": cv2 warpAffine on CPU threads,
    # only 224² uint8 crops cross the wire (~40x less H2D — required for
    # tunneled/remote accelerators at ~1.5 GB/s, where full-res 1080p feed
    # alone caps throughput at ~240 fps). "auto": host for large frames,
    # device otherwise.
    crop_on: str = "auto"
    # Output keys to fetch back to host (None = all). D2H on a tunneled
    # accelerator runs ~30 MB/s: "verts" costs 82 KB/frame (~360 fps
    # ceiling) while theta+joints cost ~1 KB/frame. The clinical
    # batch_generation path needs only kp_3d — don't fetch what you don't
    # need.
    fetch: Optional[Sequence[str]] = None
    _fwd_cache: dict = field(default_factory=dict, repr=False)

    def __post_init__(self):
        if self.buckets is None:
            import os

            env = os.environ.get("GAITLAB_BUCKETS", "")
            self.buckets = (tuple(int(x) for x in env.split(",") if x)
                            if env else DEFAULT_BUCKETS)
        if self.mesh is not None:
            # pjit shards the batch dim over "data": every static bucket
            # size must be a multiple of that axis
            d = self.mesh.shape["data"]
            self.buckets = tuple({-(-b // d) * d for b in self.buckets})
        self.buckets = tuple(sorted(set(self.buckets)))

    # -- model forward at a fixed bucket size --------------------------------

    def _forward(self, n: int, raw_uint8: bool = False):
        """Jitted forward at bucket size n. raw_uint8=True takes uint8
        crops and ImageNet-normalizes in-graph — the host-crop path ships
        raw bytes and runs ONE program per bucket (through a tunneled
        device, each eager op costs a full dispatch round trip, so
        per-chunk normalize/pad/concat ops dominate everything)."""
        key = (n, raw_uint8)
        if key in self._fwd_cache:
            return self._fwd_cache[key]
        module = self.model.module
        joint_mode = self.model.joint_mode

        precision = self.precision
        gait = module.use_gait_feat
        trunk_dtype = (jnp.dtype(self.trunk_dtype)
                       if self.trunk_dtype else None)

        def fwd(variables, smpl, images, bbox=None, cimg=None, n_valid=None):
            import contextlib

            if raw_uint8:
                images = crop_mod.normalize_image(images)
            ctx = (jax.default_matmul_precision(precision)
                   if precision and precision != "default"
                   else contextlib.nullcontext())
            with ctx:
                kw = (dict(bbox=bbox, cimg=cimg, n_valid=n_valid)
                      if gait else {})
                if trunk_dtype is not None:
                    # crops cast in-graph; params arrive pre-cast (see
                    # _trunk_variables) so the cast isn't repeated per call
                    images = images.astype(trunk_dtype)
                patt = module.apply(variables, images, **kw)
                if trunk_dtype is not None:
                    patt = {k: (v.astype(jnp.float32)
                                if hasattr(v, "astype") else v)
                            for k, v in patt.items()}
                out = vp_regress(smpl, patt, batch_size=1,
                                 joint_mode=joint_mode)[0]
            keep = ("theta", "verts", "kp_2d", "kp_3d", "pred_avg",
                    "pred_phase")
            return {k: (v[0] if k != "pred_avg" else v)
                    for k, v in out.items() if k in keep}

        if self.mesh is not None:
            assert not gait, "mesh DP + gait branch not supported yet"
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(self.mesh, P())
            data = NamedSharding(self.mesh, P("data"))
            jfwd = jax.jit(fwd,
                           in_shardings=(repl, repl, data, None, None, None),
                           out_shardings=repl)
        else:
            jfwd = jax.jit(fwd)
        self._fwd_cache[key] = jfwd
        return jfwd

    def _trunk_variables(self):
        """Model variables, pre-cast once when a trunk dtype is set."""
        if not self.trunk_dtype:
            return self.model.variables
        if getattr(self, "_cast_vars", None) is None:
            dt = jnp.dtype(self.trunk_dtype)
            cast = lambda x: (x.astype(dt)
                              if jnp.issubdtype(x.dtype, jnp.floating) else x)
            self._cast_vars = jax.tree_util.tree_map(
                cast, self.model.variables)
        return self._cast_vars

    def _bucket(self, n: int) -> int:
        i = bisect.bisect_left(self.buckets, n)
        return self.buckets[min(i, len(self.buckets) - 1)]

    def forward_crops(self, crops: jax.Array, bbox=None, cimg=None) -> dict:
        """Normalized crops (N,224,224,3) -> output dict of numpy arrays.

        Splits into at-most-max-bucket slices, pads the tail to the next
        bucket, runs the cached jitted forward per bucket size. bbox/cimg
        (N,4)/(N,2) feed the gait branch when the model has one.
        """
        return self._forward_stream(iter([crops]), bbox=bbox, cimg=cimg)

    def _forward_stream(self, crop_chunks, bbox=None, cimg=None) -> dict:
        """Streaming core: device crop chunks -> bucketed jitted forwards.

        Forwards are *dispatched* as soon as a full bucket of crops has
        accumulated and all outputs stay on device until the stream ends —
        host decode, device compute, and D2H readback pipeline instead of
        serializing (VERDICT r1 next-step #1: the old path materialised
        every crop before the first forward and fetched outputs per
        bucket, stalling the device on each readback).
        """
        gait = self.model.module.use_gait_feat
        max_b = self.buckets[-1]
        variables = self._trunk_variables()
        smpl = self.model.smpl

        def pad_to(arr, m, b):
            # host (numpy) chunks pad on host — eager device pads cost a
            # dispatch round trip each through a tunneled accelerator
            if arr is None or m == b:
                return arr
            xp = np if isinstance(arr, np.ndarray) else jnp
            rep = xp.broadcast_to(arr[-1:], (b - m,) + tuple(arr.shape[1:]))
            return xp.concatenate([arr, rep], axis=0)

        outs: list[dict] = []
        lengths: list[int] = []

        def dispatch(piece, m, start):
            b = self._bucket(m)
            raw = isinstance(piece, np.ndarray)
            piece = pad_to(piece, m, b)
            bb = pad_to(np.asarray(bbox[start : start + m], np.float32)
                        if bbox is not None else None, m, b)
            ci = pad_to(np.asarray(cimg[start : start + m], np.float32)
                        if cimg is not None else None, m, b)
            nv = np.int32(m) if gait else None
            outs.append(self._forward(b, raw_uint8=raw)(
                variables, smpl, piece, bb, ci, nv))
            lengths.append(m)

        buf: list = []
        buffered = 0
        start = 0
        for chunk in crop_chunks:
            buf.append(chunk)
            buffered += chunk.shape[0]
            while buffered >= max_b:
                xp = np if isinstance(buf[0], np.ndarray) else jnp
                cat = buf[0] if len(buf) == 1 else xp.concatenate(buf, 0)
                dispatch(cat[:max_b], max_b, start)
                start += max_b
                buffered -= max_b
                buf = [cat[max_b:]] if buffered else []
        if buffered:
            xp = np if isinstance(buf[0], np.ndarray) else jnp
            cat = buf[0] if len(buf) == 1 else xp.concatenate(buf, 0)
            dispatch(cat, buffered, start)

        # single readback pass after the full pipeline is queued; only the
        # requested keys cross the (slow) D2H link
        want = None if self.fetch is None else set(self.fetch) | {
            "pred_avg", "pred_phase"}
        fetched = [{k: (np.asarray(v[:m]) if k != "pred_avg"
                        else np.asarray(v)) for k, v in out.items()
                    if want is None or k in want}
                   for out, m in zip(outs, lengths)]
        merged = {}
        for k in fetched[0]:
            if k == "pred_avg":
                # per-chunk track-level estimate: average, weighted by how
                # many real frames each chunk holds (the tail chunk may be
                # mostly padding)
                merged[k] = np.average([o[k][0] for o in fetched], axis=0,
                                       weights=lengths)
            else:
                merged[k] = np.concatenate([o[k] for o in fetched], axis=0)
        return merged

    # -- full track ----------------------------------------------------------

    def _crop_stream(self, frames_or_paths, bboxes: np.ndarray,
                     scale: Optional[float] = None):
        """Yield device crop chunks for a track (decode -> device warp).

        Path input streams through the native prefetch loader
        (gaitlab.pipeline.loader): chunk i+1 decodes on a worker thread
        while chunk i's crop kernel runs on device.
        """
        scale = self.bbox_scale if scale is None else scale
        n = len(bboxes)
        if isinstance(frames_or_paths, np.ndarray):
            chunks = (frames_or_paths[s : s + self.ingest_chunk]
                      for s in range(0, n, self.ingest_chunk))
            frame_hw = frames_or_paths.shape[1] * frames_or_paths.shape[2]
        elif hasattr(frames_or_paths, "image_hw"):
            # chunked frame source (e.g. video.VideoChunkReader): decoded
            # chunks stream straight from the container, no image folder
            chunks = iter(frames_or_paths)
            hh, ww = frames_or_paths.image_hw
            frame_hw = hh * ww
        else:
            from gaitlab.pipeline.loader import PrefetchLoader, image_size

            chunks = iter(PrefetchLoader(frames_or_paths,
                                         chunk=self.ingest_chunk))
            hh, ww = image_size(frames_or_paths[0])
            frame_hw = hh * ww
        crop_on = self.crop_on
        if crop_on == "auto":
            # ship full-res frames only while that is cheaper than 2x the
            # crop traffic; beyond ~2x crop area, host-crop wins on H2D
            crop_on = ("device" if frame_hw <= 2 * self.crop_size ** 2
                       else "host")

        s = 0
        for chunk in chunks:
            e = s + len(chunk)
            if crop_on == "host":
                yield self._host_crop(chunk, bboxes[s:e], scale)
            else:
                yield crop_mod.crop_and_normalize(
                    chunk, bboxes[s:e], scale=scale, crop_size=self.crop_size)
            s = e
        assert s == n, (s, n)

    def _host_crop(self, chunk: np.ndarray, bboxes: np.ndarray,
                   scale: float) -> np.ndarray:
        """cv2 warpAffine on a thread pool (cv2 drops the GIL) -> host
        uint8 crops. Bit-identical to the reference's host preprocessing
        (img_utils.py:90-113). Normalization happens inside the jitted
        forward (raw_uint8 path), so the device sees one H2D + one
        program per bucket."""
        from concurrent.futures import ThreadPoolExecutor

        cs = self.crop_size
        out = np.empty((len(chunk), cs, cs, 3), np.uint8)

        def one(i):
            bb = bboxes[i]
            patch, _ = crop_mod.generate_patch_image(
                chunk[i], bb[0], bb[1], bb[2], bb[3], cs, cs, scale=scale)
            out[i] = patch

        if getattr(self, "_crop_pool", None) is None:
            self._crop_pool = ThreadPoolExecutor(max_workers=8)
        list(self._crop_pool.map(one, range(len(chunk))))
        return out

    def crop_track(self, frames_or_paths, bboxes: np.ndarray,
                   scale: Optional[float] = None) -> jnp.ndarray:
        """Frames + per-frame square bboxes -> normalized crops on device."""
        chunks = list(self._crop_stream(frames_or_paths, bboxes, scale))
        if isinstance(chunks[0], np.ndarray):  # host-crop path: raw uint8
            return crop_mod.normalize_image(
                jnp.asarray(np.concatenate(chunks, axis=0)))
        return jnp.concatenate(chunks, axis=0)

    def run_track(self, frames_or_paths, bboxes: np.ndarray,
                  scale: Optional[float] = None) -> dict:
        """Reference model-loop equivalent (demo.py:150-188) for one track.

        Returns numpy {'pred_cam' (N,3), 'verts' (N,6890,3), 'pose' (N,72),
        'betas' (N,10), 'joints3d' (N,J,3), 'joints2d' (N,J,2) normalized
        crop coords}.
        """
        bb = ci = None
        if self.model.module.use_gait_feat:
            # gait branch needs image-frame camera context: bbox + image
            # center (reference Inference gait mode, inference.py:84-85)
            if isinstance(frames_or_paths, np.ndarray):
                h, w = frames_or_paths.shape[1:3]
            elif hasattr(frames_or_paths, "image_hw"):
                h, w = frames_or_paths.image_hw
            else:
                from gaitlab.pipeline.loader import image_size

                h, w = image_size(frames_or_paths[0])
            bb = np.asarray(bboxes, np.float32)
            ci = np.full((len(bb), 2), [w * 0.5, h * 0.5], np.float32)
        out = self._forward_stream(
            self._crop_stream(frames_or_paths, bboxes, scale),
            bbox=bb, cimg=ci)
        result = {}
        if "theta" in out:
            result["pred_cam"] = out["theta"][:, :3]
            result["pose"] = out["theta"][:, 3:75]
            result["betas"] = out["theta"][:, 75:]
        for src, dst in (("verts", "verts"), ("kp_3d", "joints3d"),
                         ("kp_2d", "joints2d"), ("pred_avg", "pred_avg"),
                         ("pred_phase", "pred_phase")):
            if src in out:
                result[dst] = out[src]
        return result
