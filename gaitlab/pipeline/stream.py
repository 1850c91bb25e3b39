"""One-pass video pipeline: decode -> detect -> track -> crop -> model,
with a SINGLE video read.

The reference architecture (/root/reference/demo.py:65-188) decodes the
video twice — once for detection+tracking (MPT over the frame folder) and
once for the per-track model loop (Inference re-reads the cropped frames).
On a TPU host the video decode is pure host CPU work and often the
end-to-end bottleneck (this container: ONE host core, ~50 fps 1080p
decode), so decoding twice halves sustained throughput.

SORT is causal (gaitlab.pipeline.tracks.Sort.update is per-frame), so
detection, tracking, cropping, and the bucketed jitted forward can all run
in ONE streaming pass: each decoded chunk is detected, track assignments
update incrementally, per-track 224-crops buffer until the track proves
long enough (MIN_NUM_FRAMES, demo.py:41), and from then on crops feed a
GRNetRunner.open_stream() session whose forwards dispatch asynchronously —
host decode of chunk i+1 overlaps device compute of chunk i.

Gap-bridging parity with the reference two-pass flow
(demo_utils.py:249-297 smooth_tracking, interv=5): smooth_tracking keeps
in-track detection gaps of up to interv-1 = 4 frame ids in place and
splits segments at longer gaps. Streaming SORT reproduces exactly that
segment structure with `max_age = interv - 2 = 3` (a tracker survives m
consecutive misses iff m <= max_age, so one id spans gaps of at most
max_age+1 = interv-1 ids, and longer occlusions start a fresh id — the
same boundary smooth_tracking's flush creates). That is the default
here; tests/test_stream_onepass.py::test_onepass_gap_bridging asserts
the one-track-across-a-3-frame-occlusion equivalence.

Remaining semantic differences (documented, intentional):
  * smooth_tracking additionally *interpolates* a long gap when the
    accumulated segment is still short (<= MIN_NUM_FRAMES), synthesizing
    bboxes for unseen frames; a single-decode streaming pipeline cannot
    retroactively crop frames it has already discarded, so such rare
    segments split instead;
  * the median-background detector, when not pre-fit, calibrates on the
    first `fit_frames` decoded frames instead of a whole-video sample.
Use the two-pass CLI path when reference-exact tracking is required.
"""

from __future__ import annotations

import numpy as np

from gaitlab.pipeline import tracks as tracks_mod
from gaitlab.pipeline import video as video_mod
from gaitlab.pipeline.runner import GRNetRunner
from gaitlab.pipeline.tracks import MIN_NUM_FRAMES, xyxy_to_cxcywh_square


class _TrackState:
    """Per-person accumulation: buffered crops until the track qualifies,
    then a live ForwardStream session."""

    __slots__ = ("frames", "bboxes", "crop_buf", "session")

    def __init__(self):
        self.frames: list[int] = []
        self.bboxes: list[np.ndarray] = []
        self.crop_buf: list[np.ndarray] = []  # uint8 (224,224,3) host crops
        self.session = None


def run_video_onepass(
    runner: GRNetRunner,
    vid_file: str,
    detector=None,
    chunk: int = 32,
    min_frames: int = MIN_NUM_FRAMES,
    fit_frames: int = 64,
    max_age: int = 3,   # = smooth_tracking interv-2: see module docstring
    min_hits: int = 3,
    iou_threshold: float = 0.3,
    timer=None,
) -> dict:
    """Single-decode video -> per-track model outputs.

    Returns {person_id: run_track-style output dict + 'frames' (N,) int +
    'bboxes' (N,4) cxcywh}. Tracks shorter than `min_frames` are dropped
    (reference MIN_NUM_FRAMES gate, demo.py:41,100-103).

    `timer` (a gaitlab.utils.StageTimer) collects per-stage HOST busy
    time — decode / detect / sort / crop / feed / finish — so utilization
    can be audited: on a 1-core host the CPU stages serialize (they cannot
    overlap each other, only device work), so wall ≈ Σ(host stages) +
    un-hidden device wait. See docs/ONEPASS_UTILIZATION.json.
    """
    import contextlib

    stage = timer.stage if timer is not None else (
        lambda name: contextlib.nullcontext())
    if detector is None:
        from gaitlab.pipeline.detect import MedianBackgroundDetector

        detector = MedianBackgroundDetector()

    reader = video_mod.VideoChunkReader(vid_file, chunk=chunk,
                                        reuse_buffers=True)
    h, w = reader.image_hw
    gait = runner.model.module.use_gait_feat
    cimg_row = np.array([w * 0.5, h * 0.5], np.float32)

    # reconfirm=False: a once-confirmed track re-emits immediately after
    # an occlusion, so an m<=max_age-frame miss leaves exactly an (m+1)-id
    # gap — the smooth_tracking-tolerated structure (module docstring)
    sort = tracks_mod.Sort(max_age=max_age, min_hits=min_hits,
                           iou_threshold=iou_threshold, reconfirm=False)
    states: dict[int, _TrackState] = {}
    frame_base = 0
    fit_buf: list[np.ndarray] = []
    fitted = getattr(detector, "background", None) is not None

    def open_or_feed(pid: int, st: _TrackState):
        """Qualify + stream: once a track reaches min_frames, open its
        session, flush the buffer, and keep feeding incrementally."""
        if st.session is None:
            if len(st.frames) < min_frames:
                return
            st.session = runner.open_stream()
        if st.crop_buf:
            crops = np.stack(st.crop_buf)
            n = len(crops)
            bb = ci = None
            if gait:
                bb = np.asarray(st.bboxes[-n:], np.float32)
                ci = np.broadcast_to(cimg_row, (n, 2))
            st.session.feed(crops, bbox=bb, cimg=ci)
            st.crop_buf = []

    def process(frames: np.ndarray):
        nonlocal frame_base
        with stage("detect"):
            dets_per_frame = detector(frames)
        for i, dets in enumerate(dets_per_frame):
            with stage("sort"):
                rows = sort.update(dets)
            fidx = frame_base + i
            for row in rows:
                pid = int(row[4])
                st = states.setdefault(pid, _TrackState())
                # square stored UNscaled (track_video default); the single
                # enlargement knob is runner.bbox_scale applied at crop
                # time, exactly like run_track
                bb = xyxy_to_cxcywh_square(row[:4], 1.0)
                st.frames.append(fidx)
                st.bboxes.append(bb)
                with stage("crop"):
                    crop = runner._host_crop(frames[i : i + 1],
                                             bb[None], runner.bbox_scale)[0]
                st.crop_buf.append(crop)
        # flush once per decoded chunk: feed() buffers until a full bucket,
        # so per-frame flushes would only add numpy-stack overhead
        with stage("feed"):
            for pid in list(states):
                open_or_feed(pid, states[pid])
        frame_base += len(frames)

    frames_iter = iter(reader)
    while True:
        with stage("decode"):
            frames = next(frames_iter, None)
        if frames is None:
            break
        if not fitted and hasattr(detector, "fit"):
            # calibrate the background model on the first fit_frames
            fit_buf.append(np.array(frames))  # ring views: must copy
            if sum(len(c) for c in fit_buf) >= fit_frames:
                with stage("detect"):
                    detector.fit(np.concatenate(fit_buf, axis=0))
                fitted = True
                process(np.concatenate(fit_buf, axis=0))
                fit_buf = []
            continue
        process(frames)
    if fit_buf:
        # clip shorter than fit_frames: calibrate on what there is
        with stage("detect"):
            detector.fit(np.concatenate(fit_buf, axis=0))
        process(np.concatenate(fit_buf, axis=0))

    results = {}
    for pid, st in states.items():
        if st.session is None:
            continue  # never qualified: dropped like demo.py:100-103
        open_or_feed(pid, st)
        with stage("finish"):
            out = st.session.finish()
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
        result["frames"] = np.asarray(st.frames, np.int64)
        result["bboxes"] = np.asarray(st.bboxes, np.float32)
        results[pid] = result
    return results
