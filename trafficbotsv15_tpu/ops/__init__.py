"""Pure-function tensor ops: SE(2) transforms, pose embeddings, KNN/RPE, pooling."""

from trafficbotsv15_tpu.ops.transform import (
    cast_rad,
    rad2rot,
    pos2local,
    pos2global,
    dir2local,
    dir2global,
    rad2local,
    rad2global,
)
from trafficbotsv15_tpu.ops.pose_emb import (
    sinusoid_embed,
    sinusoid_embed_rad,
    pose_embed_xy_dir,
    pose_embed_pe_xy_yaw,
    pose_embed_pe_xy_dir,
    pose_embed_mpa_pl,
    pose_emb_out_dim,
    apply_pose_emb,
)
from trafficbotsv15_tpu.ops.rpe import get_rel_pose, get_rel_dist, get_tgt_knn
from trafficbotsv15_tpu.ops.pooling import seq_pooling
