"""PARE part-attention regression head in Flax.

Re-design of the reference PareHead (/root/reference/lib/models/pare.py:144-375)
for the deployed single-shot configuration: `use_heatmaps='part_segm'`,
`iterative_regression=False`, `num_iterations=1`, keypoint attention without
post-conv (pare.py:161,173,237-243).

Data layout is NHWC for the conv trunk and token-major (B, J, C) after
attention pooling; the torch checkpoint importer handles the layout
permutations (channel-major flatten of the shape/cam MLP inputs).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from gaitlab.core import geometry
from gaitlab.nn.layers import LocallyConnected, batch_norm, conv, keypoint_attention

Array = jax.Array


class PareHead(nn.Module):
    num_joints: int = 24
    num_input_features: int = 480
    num_features_pare: int = 128
    num_features_smpl: int = 64
    num_camera_params: int = 3
    final_conv_kernel: int = 1
    train_bn: bool = False
    # fuse softmax + both attention-pooling matmuls into one Pallas kernel
    # (gaitlab.ops.attention_pallas); numerics identical to the XLA path
    use_pallas_attention: bool = False

    def setup(self):
        pad = 1 if self.final_conv_kernel == 3 else 0
        f = self.num_features_pare
        # 2x [3x3 conv -> BN -> ReLU] stacks (pare.py:377-400, bias-free convs)
        self.kd_conv0 = conv(f, 3, 1, name="keypoint_deconv_layers_0")
        self.kd_bn1 = batch_norm(self.train_bn, name="keypoint_deconv_layers_1")
        self.kd_conv3 = conv(f, 3, 1, name="keypoint_deconv_layers_3")
        self.kd_bn4 = batch_norm(self.train_bn, name="keypoint_deconv_layers_4")
        self.sd_conv0 = conv(f, 3, 1, name="smpl_deconv_layers_0")
        self.sd_bn1 = batch_norm(self.train_bn, name="smpl_deconv_layers_1")
        self.sd_conv3 = conv(f, 3, 1, name="smpl_deconv_layers_3")
        self.sd_bn4 = batch_norm(self.train_bn, name="smpl_deconv_layers_4")
        self.keypoint_final_layer = conv(
            self.num_joints + 1, self.final_conv_kernel, 1, padding=pad,
            use_bias=True, name="keypoint_final_layer",
        )
        self.smpl_final_layer = conv(
            self.num_features_smpl, self.final_conv_kernel, 1, padding=pad,
            use_bias=True, name="smpl_final_layer",
        )
        self.pose_mlp = LocallyConnected(
            num_tokens=self.num_joints, features=6, name="pose_mlp"
        )
        self.shape_mlp = nn.Dense(10, name="shape_mlp")
        self.cam_mlp = nn.Dense(self.num_camera_params, name="cam_mlp")

    def feature_extractor(self, features: Array) -> dict:
        """Backbone features (N,56,56,480) -> pooled per-part features.

        Mirrors pare.py:245-269: part branch -> 24+1 part-segm logits (bg
        dropped, pare.py:316), smpl branch -> 128/64-ch features, keypoint
        attention pooling of both.
        """
        x = nn.relu(self.kd_bn1(self.kd_conv0(features)))
        part_feats = nn.relu(self.kd_bn4(self.kd_conv3(x)))
        heatmaps = self.keypoint_final_layer(part_feats)
        part_attention = heatmaps[..., 1:]

        y = nn.relu(self.sd_bn1(self.sd_conv0(features)))
        smpl_feats = nn.relu(self.sd_bn4(self.sd_conv3(y)))
        cam_shape_feats = self.smpl_final_layer(smpl_feats)

        if self.use_pallas_attention:
            from gaitlab.ops.attention_pallas import keypoint_attention_fused

            point_local_feat, cam_shape_pooled = keypoint_attention_fused(
                smpl_feats, cam_shape_feats, part_attention)  # (N,J,128/64)
        else:
            point_local_feat = keypoint_attention(smpl_feats, part_attention)      # (N,J,128)
            cam_shape_pooled = keypoint_attention(cam_shape_feats, part_attention)  # (N,J,64)
        return {
            "point_local_feat": point_local_feat,
            "cam_shape_feats": cam_shape_pooled,
            "pred_segm_mask": heatmaps,
        }

    def predict(self, point_local_feat: Array, cam_shape_feats: Array) -> dict:
        """Final regressors from pooled features (pare.py:338-375).

        point_local_feat: (N, J, 128); cam_shape_feats: (N, J, 64).
        Exposed separately so the gait-branch corrector can re-run it on
        corrected pose features (grnet.py:162-169).
        """
        n = point_local_feat.shape[0]
        pred_pose6d = self.pose_mlp(point_local_feat)  # (N, J, 6)
        shape_flat = cam_shape_feats.reshape(n, -1)    # (N, J*64) token-major
        pred_shape = self.shape_mlp(shape_flat)
        pred_cam = self.cam_mlp(shape_flat)

        pred_rotmat = geometry.rot6d_to_rotmat(pred_pose6d.reshape(-1, 6)).reshape(
            n, self.num_joints, 3, 3
        )
        return {
            "pred_rotmat": pred_rotmat,
            "pred_pose": pred_rotmat,  # alias kept for reference-key parity
            "pred_cam": pred_cam,
            "pred_shape": pred_shape,
            "pred_rot6d": pred_pose6d,
        }

    def __call__(self, features: Array) -> dict:
        feats = self.feature_extractor(features)
        out = self.predict(feats["point_local_feat"], feats["cam_shape_feats"])
        out.update(feats)
        return out
