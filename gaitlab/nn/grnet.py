"""GRNet: frozen HRNet backbone + PARE head + SMPL regressor, composed in JAX.

Re-design of the reference top model (/root/reference/lib/models/grnet.py).
The flax module covers the neural trunk (backbone + head [+ gait-feature
corrector]); the SMPL regression (reference VPRegressor, pare.py:24-91) is a
pure function over the SMPLParams pytree, so the *entire* video->mesh
forward traces into one XLA program: reshape (B,T,...) -> conv trunk ->
attention pooling -> rot6d -> LBS -> projection -> output dict.

Output contract matches grnet.py:171 / pare.py:78-84:
  [{'theta': (B,T,85), 'verts': (B,T,6890,3), 'kp_2d': (B,T,J,2),
    'kp_3d': (B,T,J,3), 'rotmat': (B,T,24,3,3)}]
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from gaitlab.body import smpl as body_smpl
from gaitlab.core import geometry
from gaitlab.nn.hrnet import HRNetCfg, PoseHighResolutionNet
from gaitlab.nn.pare_head import PareHead

Array = jax.Array


class GRNetCore(nn.Module):
    """Neural trunk: HRNet-W32 backbone (frozen) + PARE head.

    Mirrors grnet.py:52-65,129-152. The optional gait-feature corrector
    (grnet.py:154-169) is wired in by gaitlab.nn.gait when enabled.
    """

    num_joints: int = 24
    num_input_features: int = 480
    num_features_pare: int = 128
    num_features_smpl: int = 64
    backbone_width: int = 32
    # space-to-depth packing threshold for low-channel backbone branches
    # (HRNetCfg.pack_low_channel): exact same math, weights interchangeable
    # with the unpacked module. MEASURED SLOWER on TPU v5e (scripts/
    # pack_bench.py: 103->122 ms at "high" for pack=32) — XLA's native
    # low-channel conv handling beats the naive MXU-lane model. Kept as a
    # documented experiment; leave 0 in production.
    pack_low_channel: int = 0
    # Per-region backbone matmul-precision overrides (HRNetCfg
    # .region_precision): tuple of (region, precision) pairs. The mixed-
    # precision production modes (docs/PRECISION.json) pin the bf16-
    # sensitive stages at "high" while the rest rides the caller's global
    # precision context.
    backbone_region_precision: tuple = ()
    # Activation-dtype casts at backbone region boundaries (HRNetCfg
    # .cast_after) — the bf16-trunk hybrid knob.
    backbone_cast_after: tuple = ()
    # Narrow activation STORAGE inside backbone regions (HRNetCfg
    # .act_store) — the layer1 HBM-traffic probe (docs/PRECISION.json
    # `+l1act16`); pair with backbone_region_precision (region, "w2x").
    backbone_act_store: tuple = ()
    # Space-to-depth packed stem conv (HRNetCfg.stem_s2d experiment).
    stem_s2d: bool = False
    # Stage depth (HRNetCfg.w modules/blocks): deployed topology is
    # (1, 4, 3) modules x 4 blocks; dryruns/tests shrink these to cut
    # XLA:CPU compile time (op-count-bound) while keeping every branch/
    # transition/fuse path and parameter shape family.
    backbone_modules: tuple = (1, 4, 3)
    backbone_blocks: int = 4
    # Bilinear-resize einsum precision in the HR upsample heads
    # (HRNetCfg.resize_precision; "highest" = bit-faithful default).
    backbone_resize_precision: str = "highest"
    # Matmul precision for the PARE head, overriding the caller's global
    # context ("default" | "high" | "float32"; None = inherit). The
    # qualified production mode runs the backbone at "high" and the head
    # at single-pass "default": the bf16 error lives in the deep conv
    # stack, not the head (docs/PRECISION.json r3: 0.35 mm vs 0.24 with
    # head high, at 1.17x the throughput).
    head_precision: Optional[str] = None

    def _head_prec(self):
        import contextlib

        return (jax.default_matmul_precision(self.head_precision)
                if self.head_precision else contextlib.nullcontext())
    freeze_backbone: bool = True
    use_gait_feat: bool = False      # reference grnet.py:40 default False
    use_pallas_attention: bool = False
    featcorr_avg_dim: int = 3        # MODEL.FEAT_CORR.* (config.py:54-60)
    featcorr_estim_phase: bool = True
    featcorr_num_layers: int = 1
    featcorr_h_size: int = 1024
    featcorr_num_heads: int = 4
    featcorr_use_jwff: bool = False
    # Run the PARE head's BatchNorms in batch mode (PareHead.train_bn):
    # needed by full-model BN calibration (training.calibrate_all_bn) —
    # the head has its own BNs whose running stats otherwise never leave
    # fresh-init (0,1), which collapses random-weight probes into
    # input-independent functions just like the backbone's would.
    head_train_bn: bool = False

    def setup(self):
        self.backbone = PoseHighResolutionNet(
            HRNetCfg.w(self.backbone_width, downsample=False, use_conv=True,
                       pack_low_channel=self.pack_low_channel,
                       region_precision=self.backbone_region_precision,
                       cast_after=self.backbone_cast_after,
                       act_store=self.backbone_act_store,
                       stem_s2d=self.stem_s2d,
                       modules=self.backbone_modules,
                       blocks=self.backbone_blocks,
                       resize_precision=self.backbone_resize_precision),
            name="backbone",
        )
        self.head = PareHead(
            num_joints=self.num_joints,
            num_input_features=self.num_input_features,
            num_features_pare=self.num_features_pare,
            num_features_smpl=self.num_features_smpl,
            use_pallas_attention=self.use_pallas_attention,
            train_bn=self.head_train_bn,
            name="head",
        )
        if self.use_gait_feat:
            from gaitlab.nn.gait import FeatCorrector

            self.pfeat_corrector = FeatCorrector(
                num_joints=self.num_joints,
                feat_dim=self.num_features_pare,
                num_avg_gfeat=self.featcorr_avg_dim,
                estim_phase=self.featcorr_estim_phase,
                num_layers=self.featcorr_num_layers,
                h_size=self.featcorr_h_size,
                num_heads=self.featcorr_num_heads,
                use_jwff=self.featcorr_use_jwff,
                name="pfeat_corrector",
            )

    def __call__(self, images: Array, train: bool = False,
                 bbox: Optional[Array] = None,
                 cimg: Optional[Array] = None,
                 n_valid: Optional[Array] = None) -> dict:
        """images: (N, 224, 224, 3) normalized crops (NHWC); one track
        (N = frames). bbox/cimg feed the gait branch (grnet.py:154-169).
        n_valid (scalar int) marks how many leading frames are real when
        the runner tail-pads to a bucket size — padded frames are masked
        out of the gait GRU/attention so they can't skew the track-level
        gait estimates."""
        features = self.backbone(images, train=False)  # frozen: BN inference
        if self.freeze_backbone:
            features = jax.lax.stop_gradient(features)  # grnet.py:145-146
        if not self.use_gait_feat:
            with self._head_prec():
                return self.head(features)

        from gaitlab.nn import gait as gait_mod

        assert bbox is not None and cimg is not None
        n = images.shape[0]
        with self._head_prec():
            feats = self.head.feature_extractor(features)
            patt = self.head.predict(feats["point_local_feat"],
                                     feats["cam_shape_feats"])
        cparams = gait_mod.camera_reparam(patt["pred_cam"], bbox, cimg)
        seq_lengths = (jnp.asarray(n_valid, jnp.int32).reshape(1)
                       if n_valid is not None else None)
        corrected, pred_avg, pred_phase = self.pfeat_corrector(
            feats["point_local_feat"][None],  # (1, N, J, C): one track
            cparams[None],
            seq_lengths=seq_lengths,
        )
        with self._head_prec():
            out = self.head.predict(corrected[0], feats["cam_shape_feats"])
        out.update({k: v for k, v in feats.items()
                    if k == "pred_segm_mask"})
        out["pred_avg"] = pred_avg
        out["pred_phase"] = pred_phase
        out["pred_cparam"] = cparams
        return out

    def head_predict(self, point_local_feat: Array, cam_shape_feats: Array) -> dict:
        with self._head_prec():
            return self.head.predict(point_local_feat, cam_shape_feats)


def vp_regress(
    smpl_params: body_smpl.SMPLParams,
    patt_output: dict,
    batch_size: int = 1,
    J_regressor: Optional[Array] = None,
    joint_mode: str = "spin2",
    focal_length: float = 5000.0,
    img_res: int = 224,
) -> list[dict]:
    """SMPL regression + output assembly (reference VPRegressor.forward,
    pare.py:52-91)."""
    pred_rotmat = patt_output["pred_pose"]  # (N,24,3,3)
    n = pred_rotmat.shape[0]
    smpl_out = body_smpl.smpl_head(
        smpl_params,
        pred_rotmat,
        patt_output["pred_shape"],
        cam=patt_output["pred_cam"],
        focal_length=focal_length,
        img_res=img_res,
        normalize_joints2d=True,
        joint_mode=joint_mode,
    )
    pose = geometry.rotmat_to_axis_angle(pred_rotmat.reshape(-1, 3, 3)).reshape(n, 72)
    seqlen = n // batch_size

    joints3d = smpl_out["smpl_joints3d"]
    if J_regressor is not None:
        pred_joints = jnp.einsum(
            "jv,nvk->njk", J_regressor, smpl_out["smpl_vertices"],
            precision=jax.lax.Precision.HIGHEST,
        )
        if J_regressor.shape[0] < 24:
            pred_joints = pred_joints[:, list(body_smpl.H36M_TO_J14)]
        joints3d = pred_joints

    theta = jnp.concatenate(
        [patt_output["pred_cam"], pose, patt_output["pred_shape"]], axis=1
    )
    out = {
        "theta": theta.reshape(batch_size, seqlen, -1),
        "verts": smpl_out["smpl_vertices"].reshape(batch_size, seqlen, -1, 3),
        "kp_2d": smpl_out["smpl_joints2d"].reshape(batch_size, seqlen, -1, 2),
        "kp_3d": joints3d.reshape(batch_size, seqlen, -1, 3),
        "rotmat": pred_rotmat.reshape(batch_size, seqlen, -1, 3, 3),
    }
    # gait branch extras (grnet.py:166-168,172-174)
    for k in ("pred_avg", "pred_phase", "pred_cparam"):
        if k in patt_output:
            out[k] = patt_output[k]
    return [out]


@dataclass
class GRNet:
    """Bundled model: flax trunk + variables + SMPL params.

    `forward` accepts the reference input contract — (B,T,3,224,224) or
    (T,3,224,224) channel-first crops (grnet.py:129-143) — or NHWC
    (N,224,224,3), and returns the reference-style output list.
    """

    module: GRNetCore
    variables: Any
    smpl: body_smpl.SMPLParams
    joint_mode: str = "spin2"

    @staticmethod
    def create(
        smpl_params: Optional[body_smpl.SMPLParams] = None,
        seed: int = 0,
        joint_mode: str = "spin2",
        cache_init: bool = True,
        init_img: int = 224,
        **module_kwargs,
    ) -> "GRNet":
        """init_img sizes the crop the trunk is initialised (and must be
        applied) at: the PARE head's locally-connected/attention params
        depend on the feature-grid size (init_img // 4). 224 is the
        deployed operating point; smaller values make cheap dryrun/test
        models (pair with GRNetRunner(crop_size=init_img))."""
        module = GRNetCore(**module_kwargs)
        rng = jax.random.PRNGKey(seed)
        init_kwargs = {}
        if module.use_gait_feat:
            init_kwargs = dict(bbox=jnp.ones((1, 4), jnp.float32) * 100,
                               cimg=jnp.ones((1, 2), jnp.float32) * 100)

        def build():
            # Initialise on CPU: tracing init through the TPU tunnel costs
            # minutes; params transfer to the accelerator on first use.
            with jax.default_device(jax.local_devices(backend="cpu")[0]):
                return module.init(
                    rng, jnp.zeros((1, init_img, init_img, 3), jnp.float32),
                    **init_kwargs)

        if cache_init:
            from gaitlab.weights.cache import memo_tree

            key = f"grnet-init|seed={seed}|{repr(module)}" + (
                f"|img={init_img}" if init_img != 224 else "")
            variables = memo_tree(key, build)
        else:
            variables = build()
        if smpl_params is None:
            smpl_params = body_smpl.synthetic_smpl_params()
        return GRNet(module=module, variables=variables, smpl=smpl_params,
                     joint_mode=joint_mode)

    def trunk(self, images_nhwc: Array, bbox: Optional[Array] = None,
              cimg: Optional[Array] = None) -> dict:
        kw = {}
        if self.module.use_gait_feat:
            kw = dict(bbox=bbox, cimg=cimg)
        return self.module.apply(self.variables, images_nhwc, **kw)

    def forward(
        self, images: Array, J_regressor: Optional[Array] = None,
        bbox: Optional[Array] = None, cimg: Optional[Array] = None,
    ) -> list[dict]:
        if images.ndim == 5:  # (B,T,3,H,W)
            b, t = images.shape[:2]
            x = images.reshape((-1,) + images.shape[2:])
        elif images.ndim == 4 and images.shape[1] == 3:  # (T,3,H,W)
            b, t = 1, images.shape[0]
            x = images
        elif images.ndim == 4:  # (N,H,W,C) NHWC
            b, t = 1, images.shape[0]
            x = None
        else:
            raise ValueError(f"Wrong input rank: {images.shape}")
        nhwc = images if x is None else jnp.transpose(x, (0, 2, 3, 1))
        patt = self.trunk(nhwc, bbox=bbox, cimg=cimg)
        return vp_regress(
            self.smpl, patt, batch_size=b, J_regressor=J_regressor,
            joint_mode=self.joint_mode,
        )
