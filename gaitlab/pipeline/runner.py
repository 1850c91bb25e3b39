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
    # the bf16 error lives in the deep conv stack (per-region study,
    # docs/PRECISION.json r3), so paired with head_precision="auto" the
    # backbone runs at "high" and the PARE head at single-pass bf16 —
    # 0.35 mm MPJPE worst-case vs the f32 torch reference at ~1476
    # fps/chip (1.17x round-2's all-high 1261). "float32" (bf16_6x) is
    # exact parity (0.002 mm); "default" single-pass bf16 compounds
    # ~14 mm through the ~100-conv stack and is NOT within the 0.5 mm
    # budget (SURVEY.md §7 hard part #4).
    precision: str = "high"
    # PARE-head matmul precision: "auto" = single-pass bf16 ("default")
    # when precision=="high" (the qualified mixed mode), inherit the
    # global context otherwise (so "float32" parity stays exact). Set
    # None to always inherit, or an explicit precision name.
    head_precision: Optional[str] = "auto"
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
    # Multi-chip strategy. None: single chip (or whatever `mesh` says).
    # "dp": data parallel — builds a 1-D mesh over all local devices when
    # `mesh` is not given; zero inter-chip bytes, linear throughput; the
    # production choice (docs/PERFORMANCE.md §Scaling). "pp": GPipe-style
    # 2-stage pipeline (backbone group | head+SMPL group,
    # gaitlab.parallel.pipeline) — pays ~3.0 MB/frame of boundary traffic;
    # wins only when stage weights exceed one chip's HBM or batch-1
    # latency must shrink below one chip's forward. Gait branch: DP only.
    parallel: Optional[str] = None
    # "pp" only: backbone group size (default: half the devices; the
    # backbone is ~5x the head's FLOPs, so latency-tuned splits want more).
    pp_n_stage0: Optional[int] = None
    _fwd_cache: dict = field(default_factory=dict, repr=False)

    def __post_init__(self):
        from gaitlab.utils import enable_compile_cache

        enable_compile_cache()  # repeat program shapes compile warm
        if self.parallel not in (None, "dp", "pp"):
            raise ValueError(f"parallel={self.parallel!r}: use 'dp'/'pp'")
        if self.parallel == "pp" and self.mesh is not None:
            raise ValueError("parallel='pp' builds its own device groups; "
                             "drop mesh= (or use parallel='dp')")
        if self.parallel == "pp" and self.model.module.use_gait_feat:
            raise ValueError(
                "parallel='pp' pipelines the per-frame trunk; the gait "
                "branch is track-sequential — use parallel='dp'")
        if self.parallel == "dp" and self.mesh is None:
            from gaitlab.parallel.mesh import make_mesh

            self.mesh = make_mesh(len(jax.devices()))
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

    def resolved_head_precision(self) -> Optional[str]:
        """The PARE-head matmul precision actually compiled in.

        "auto" resolves to single-pass bf16 ("default") only under a
        "high" backbone — the qualified mixed mode (docs/PRECISION.json
        r3: 0.35 mm, 1.17x); any other global precision (esp. float32
        parity) inherits the context (None)."""
        head_prec = self.head_precision
        if head_prec == "auto":
            head_prec = "default" if self.precision == "high" else None
        return head_prec

    def resolved_region_precision(self) -> tuple:
        """Backbone per-region precision the jitted forward compiles in.

        Under the qualified "high" mode the HR upsample-head convs run the
        2-pass w2x decomposition (docs/PRECISION.json W:heads — 0.3656 mm
        worst-case vs 0.349 at all-high, for 1616 vs 1481 fps; the
        round-4 production default). Any module-level region_precision
        override wins; any other global precision (esp. float32 parity)
        gets no regions."""
        mod_regions = tuple(self.model.module.backbone_region_precision)
        if mod_regions:
            return mod_regions
        if self.precision == "high":
            return (("heads", "w2x"),)
        return ()

    def resolved_resize_precision(self) -> str:
        """Bilinear-resize einsum precision the forward compiles in: the
        qualified "high" mode drops the HBM-bound resizes from 6-pass
        HIGHEST to 3-pass "high" (docs/PRECISION.json `+resize_high`:
        0.3675 mm, 1640 fps — +0.002 mm for +1.6%); float32 parity keeps
        the bit-faithful HIGHEST. A non-default module setting wins."""
        mod = self.model.module.backbone_resize_precision
        if mod != "highest":
            return mod
        return "high" if self.precision == "high" else "highest"

    def _resolved_module(self):
        """The module the jitted forward actually compiles: the model's
        module with head_precision forced to resolved_head_precision(),
        the backbone regions to resolved_region_precision(), and the
        resize precision to resolved_resize_precision().
        Clones even when the target is None/() — "inherit" must actively
        CLEAR a module-level override, or a module built with
        head_precision="default" would keep its head at bf16 inside a
        precision="float32" parity run."""
        module = self.model.module
        head_prec = self.resolved_head_precision()
        regions = self.resolved_region_precision()
        resize = self.resolved_resize_precision()
        if (module.head_precision != head_prec
                or tuple(module.backbone_region_precision) != regions
                or module.backbone_resize_precision != resize):
            module = module.clone(head_precision=head_prec,
                                  backbone_region_precision=regions,
                                  backbone_resize_precision=resize)
        return module

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
        module = self._resolved_module()
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
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(self.mesh, P())
            data = NamedSharding(self.mesh, P("data"))
            if gait:
                # conv trunk shards over "data"; the gait GRU is
                # sequential in time, so GSPMD all-gathers the pooled
                # per-frame features (a few KB/frame) before the scan —
                # DP gains apply to the backbone+head, which is >95% of
                # the FLOPs. bbox/cimg rows ride with their frames;
                # n_valid is a replicated scalar.
                in_sh = (repl, repl, data, data, data, repl)
            else:
                in_sh = (repl, repl, data, None, None, None)
            jfwd = jax.jit(fwd, in_shardings=in_sh, out_shardings=repl)
        else:
            jfwd = jax.jit(fwd)
        self._fwd_cache[key] = jfwd
        return jfwd

    def _device_tree(self, tree):
        """Pin a pytree on the accelerator (replicated over the mesh).

        Model variables restored from the Orbax init/weight cache are host
        numpy; passing them to jit per call re-uploads ~250 MB of weights
        through the (slow, tunneled) H2D link on EVERY dispatch — measured
        ~4 s/dispatch vs ~0.1 s compute at bucket 256. One device_put here
        makes every later dispatch reuse the resident copy.

        The target device must be EXPLICIT: `jax.device_put(x)` with no
        target is a no-op for arrays that are already jax Arrays, and
        GRNet.create initialises on the CPU backend — so the fresh-init
        path (first run of a config, cold weight cache) would leave the
        "pinned" weights CPU-resident and silently re-upload the full
        tree on every dispatch (measured 3.4 s vs 79 ms per batch-128
        step; this was round 3's mis-diagnosed 'serve dispatch overhead',
        docs/SERVE_BENCH.json)."""
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            return jax.device_put(tree, NamedSharding(self.mesh, P()))
        return jax.device_put(tree, jax.devices()[0])

    def _smpl_params(self):
        """SMPL parameter pytree, device-resident (cached)."""
        if getattr(self, "_smpl_dev", None) is None:
            self._smpl_dev = self._device_tree(self.model.smpl)
        return self._smpl_dev

    def _trunk_variables(self):
        """Model variables, device-resident; pre-cast once when a trunk
        dtype is set. Refreshes if model.variables is reassigned (e.g.
        weight reload through the api)."""
        if getattr(self, "_dev_vars_src", None) is not self.model.variables:
            self._dev_vars = None
            self._dev_vars_src = self.model.variables
        if getattr(self, "_dev_vars", None) is None:
            variables = self.model.variables
            if self.trunk_dtype:
                dt = jnp.dtype(self.trunk_dtype)
                cast = lambda x: (x.astype(dt) if jnp.issubdtype(
                    x.dtype, jnp.floating) else x)
                variables = jax.tree_util.tree_map(cast, variables)
            self._dev_vars = self._device_tree(variables)
        return self._dev_vars

    def _pp_pipeline(self):
        """Lazily built 2-stage GPipe pipeline (parallel='pp')."""
        if getattr(self, "_pp", None) is None:
            from gaitlab.parallel.pipeline import GRNetPipeline

            self._pp = GRNetPipeline(self.model, n_stage0=self.pp_n_stage0)
        return self._pp

    def _pp_forward(self, crops) -> dict:
        """All-at-once forward through the 2-stage pipeline.

        Crops may be host uint8 (raw path) or normalized f32; microbatch
        size is auto-selected (GRNetPipeline.default_microbatch). Output
        matches the DP forward's key set so every downstream consumer
        (demo/serve/api) is strategy-agnostic.
        """
        if isinstance(crops, np.ndarray) and crops.dtype == np.uint8:
            crops = crop_mod.normalize_image(jnp.asarray(crops))
        out = self._pp_pipeline()(crops)
        keep = ("theta", "verts", "kp_2d", "kp_3d")
        want = set(keep if self.fetch is None else self.fetch)
        return {k: np.asarray(v[0]) for k, v in out.items()
                if k in keep and k in want}

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

    def open_stream(self, bbox=None, cimg=None) -> "ForwardStream":
        """Open an incremental inference session.

        One-pass pipelines (decode -> detect -> track -> crop -> model with
        a SINGLE video read) feed crop chunks as they become available and
        call finish() once at the end; forwards dispatch as full buckets
        accumulate, and outputs stay on device until finish(). bbox/cimg
        may be given upfront (full arrays, row i for frame i) or per feed()
        call (rows aligned with that chunk) for the gait branch.
        """
        return ForwardStream(self, bbox=bbox, cimg=cimg)

    def _forward_stream(self, crop_chunks, bbox=None, cimg=None) -> dict:
        """Streaming core: crop chunks -> bucketed jitted forwards.

        Forwards are *dispatched* as soon as a full bucket of crops has
        accumulated and all outputs stay on device until the stream ends —
        host decode, device compute, and D2H readback pipeline instead of
        serializing (VERDICT r1 next-step #1: the old path materialised
        every crop before the first forward and fetched outputs per
        bucket, stalling the device on each readback).
        """
        session = self.open_stream(bbox=bbox, cimg=cimg)
        for chunk in crop_chunks:
            session.feed(chunk)
        return session.finish()

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

        # ring-buffer readers (video.VideoChunkReader reuse_buffers=True)
        # hand out views that are rewritten after the next pull; the host
        # crop copies synchronously (cv2), but the device path may alias
        # or DMA the host buffer asynchronously — snapshot it first.
        ring = bool(getattr(frames_or_paths, "reuse_buffers", False))

        s = 0
        for chunk in chunks:
            e = s + len(chunk)
            if crop_on == "host":
                yield self._host_crop(chunk, bboxes[s:e], scale)
            else:
                if ring:
                    chunk = np.array(chunk)
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
        import os

        cs = self.crop_size
        out = np.empty((len(chunk), cs, cs, 3), np.uint8)

        def one(i):
            bb = bboxes[i]
            patch, _ = crop_mod.generate_patch_image(
                chunk[i], bb[0], bb[1], bb[2], bb[3], cs, cs, scale=scale)
            out[i] = patch

        # pool sized to the host: oversubscribing a small host (this
        # container has ONE core) costs ~4x in scheduler contention vs the
        # plain loop (measured 219 -> 968 fps single-core)
        workers = min(8, os.cpu_count() or 1)
        if workers <= 1:
            for i in range(len(chunk)):
                one(i)
            return out
        from concurrent.futures import ThreadPoolExecutor

        if getattr(self, "_crop_pool", None) is None:
            self._crop_pool = ThreadPoolExecutor(max_workers=workers)
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


class ForwardStream:
    """Incremental bucketed-forward session (GRNetRunner.open_stream).

    feed() accepts crop chunks — host uint8 (raw path, normalized in-graph)
    or device-normalized f32 — plus optional aligned bbox/cimg rows for the
    gait branch; a jitted forward dispatches whenever a full max-size
    bucket has accumulated, overlapping host decode/crop with device
    compute. finish() dispatches the tail, performs ONE readback pass of
    the requested output keys, and merges.
    """

    def __init__(self, runner: GRNetRunner, bbox=None, cimg=None,
                 async_dispatch: bool = True):
        self.runner = runner
        self.gait = runner.model.module.use_gait_feat
        self.max_b = runner.buckets[-1]
        # parallel="pp": the GPipe pipeline consumes the whole track at
        # once and microbatches internally — buffer every chunk and hand
        # off in finish(); the per-bucket dispatch machinery below idles.
        self._pp_mode = runner.parallel == "pp"
        if self._pp_mode:
            if self.gait:
                raise ValueError(
                    "parallel='pp' pipelines the per-frame trunk; the gait "
                    "branch is track-sequential — use parallel='dp'")
            self.max_b = 1 << 62
            async_dispatch = False
            self._variables = self._smpl = None  # stages pin their own
        else:
            self._variables = runner._trunk_variables()
            self._smpl = runner._smpl_params()
        self._bbox_full = bbox
        self._cimg_full = cimg
        self._buf: list = []
        self._bb_buf: list = []
        self._ci_buf: list = []
        self._buffered = 0
        self._start = 0
        self._outs: list = []
        self._lengths: list = []
        self._done = False
        # Dispatch on a worker thread: through a tunneled accelerator the
        # jit call blocks while the argument bytes upload (~5-7 ms/frame
        # of 224² uint8 crops at the measured 20-40 MB/s link), which
        # would otherwise serialize with host decode/detect/crop.
        # device_put/dispatch release the GIL during the copy, so the
        # overlap is real even on a 1-core host.
        self._async = bool(async_dispatch)
        self._q = None
        self._thread = None
        self._err: list = []
        if self._async:
            import queue as queue_mod
            import threading

            self._q = queue_mod.Queue(maxsize=2)

            def drain():
                while True:
                    item = self._q.get()
                    try:
                        if item is None:
                            return
                        if not self._err:
                            self._run_forward(*item)
                    except BaseException as e:  # surfaced at feed/finish
                        self._err.append(e)
                    finally:
                        self._q.task_done()

            self._thread = threading.Thread(target=drain, daemon=True)
            self._thread.start()

    @staticmethod
    def _pad_to(arr, m: int, b: int):
        # host (numpy) chunks pad on host — eager device pads cost a
        # dispatch round trip each through a tunneled accelerator
        if arr is None or m == b:
            return arr
        xp = np if isinstance(arr, np.ndarray) else jnp
        rep = xp.broadcast_to(arr[-1:], (b - m,) + tuple(arr.shape[1:]))
        return xp.concatenate([arr, rep], axis=0)

    def _take_rows(self, full, bufs: list, m: int):
        """Next m bbox/cimg rows: from the upfront array or feed buffers."""
        if full is not None:
            return np.asarray(full[self._start : self._start + m],
                              np.float32)
        if not bufs:
            return None
        cat = bufs[0] if len(bufs) == 1 else np.concatenate(bufs, axis=0)
        assert len(cat) >= m, (len(cat), m, "bbox/cimg rows lag crop feed")
        bufs.clear()
        if len(cat) > m:
            bufs.append(cat[m:])
        return np.asarray(cat[:m], np.float32)

    def _run_forward(self, b, raw, piece, bb, ci, nv):
        """Execute one bucketed forward (worker thread when async)."""
        r = self.runner
        self._outs.append(r._forward(b, raw_uint8=raw)(
            self._variables, self._smpl, piece, bb, ci, nv))

    def _check_err(self):
        if self._err:
            err, self._err = self._err[0], []
            raise err

    def _dispatch(self, piece, m: int):
        self._check_err()
        r = self.runner
        b = r._bucket(m)
        raw = isinstance(piece, np.ndarray)
        piece = self._pad_to(piece, m, b)
        bb = self._pad_to(self._take_rows(self._bbox_full, self._bb_buf, m),
                          m, b)
        ci = self._pad_to(self._take_rows(self._cimg_full, self._ci_buf, m),
                          m, b)
        nv = np.int32(m) if self.gait else None
        if self._q is not None:
            self._q.put((b, raw, piece, bb, ci, nv))
        else:
            self._run_forward(b, raw, piece, bb, ci, nv)
        self._lengths.append(m)
        self._start += m

    def feed(self, chunk, bbox=None, cimg=None) -> None:
        """Add a crop chunk (and, for the gait branch when bbox/cimg were
        not given upfront, the aligned per-frame rows)."""
        assert not self._done, "feed() after finish()"
        self._check_err()
        self._buf.append(chunk)
        self._buffered += chunk.shape[0]
        if bbox is not None:
            self._bb_buf.append(np.asarray(bbox, np.float32))
        if cimg is not None:
            self._ci_buf.append(np.asarray(cimg, np.float32))
        while self._buffered >= self.max_b:
            xp = np if isinstance(self._buf[0], np.ndarray) else jnp
            cat = (self._buf[0] if len(self._buf) == 1
                   else xp.concatenate(self._buf, axis=0))
            self._dispatch(cat[: self.max_b], self.max_b)
            self._buffered -= self.max_b
            self._buf = [cat[self.max_b :]] if self._buffered else []

    def finish(self) -> dict:
        """Dispatch the tail, read back the requested keys once, merge."""
        assert not self._done, "finish() called twice"
        self._done = True
        if self._pp_mode:
            if not self._buffered:
                return {}
            xp = np if isinstance(self._buf[0], np.ndarray) else jnp
            cat = (self._buf[0] if len(self._buf) == 1
                   else xp.concatenate(self._buf, axis=0))
            self._buf = []
            return self.runner._pp_forward(cat)
        if self._buffered:
            xp = np if isinstance(self._buf[0], np.ndarray) else jnp
            cat = (self._buf[0] if len(self._buf) == 1
                   else xp.concatenate(self._buf, axis=0))
            self._dispatch(cat, self._buffered)
            self._buf = []
        if self._thread is not None:
            self._q.put(None)
            self._thread.join()
            self._thread = None
            self._check_err()
        if not self._outs:  # zero frames fed: empty result, not a crash
            return {}
        # single readback pass after the full pipeline is queued; only the
        # requested keys cross the (slow) D2H link
        fetch = self.runner.fetch
        want = None if fetch is None else set(fetch) | {
            "pred_avg", "pred_phase"}
        fetched = [{k: (np.asarray(v[:m]) if k != "pred_avg"
                        else np.asarray(v)) for k, v in out.items()
                    if want is None or k in want}
                   for out, m in zip(self._outs, self._lengths)]
        self._outs = []
        merged = {}
        for k in fetched[0]:
            if k == "pred_avg":
                # per-chunk track-level estimate: average, weighted by how
                # many real frames each chunk holds (the tail chunk may be
                # mostly padding)
                merged[k] = np.average([o[k][0] for o in fetched], axis=0,
                                       weights=self._lengths)
            else:
                merged[k] = np.concatenate([o[k] for o in fetched], axis=0)
        return merged
