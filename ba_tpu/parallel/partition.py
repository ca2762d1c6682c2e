"""Host-side landmark partitioning for the distributed Schur solve.

SURVEY.md §5.8: "each shard owns a slice of residuals/**landmark blocks**".
Landmarks are ordered by their reference pose (so a contiguous chunk is a
keyframe segment of the trajectory) and split into `n_shards` equal chunks;
every projection residual is *owned by its landmark's shard* (a projection
touches exactly one landmark, so ownership is unambiguous — no halo
exchange).  With this layout the per-landmark system V, rhs_l, the W
columns, and the back-substitution are all shard-local; only the reduced
pose system S (and the pose-space partial sums) cross shards, via one psum.

This is the layout the round-1 design replicated ("states replicated",
the memory wall at reference scale): per-device W shrinks by the shard
count.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..core.problem import (BAConfig, Problem, build_structure_index)


def _to_np(tree):
    return jnp.asarray(tree)


def partition_by_landmark(problem: Problem, config: BAConfig,
                          n_shards: int) -> Problem:
    """Reorder landmarks by keyframe segment and group projection rows by
    owning shard (equal-size, padded).  Returns a new Problem whose lms /
    proj tables are laid out so axis-0 sharding over `n_shards` devices
    gives each device exactly its own landmarks + their residuals.

    Call before `prepare_landmarks` (all (L, ...) state arrays are
    permuted together, so calling after is also correct).
    """
    lms = problem.lms
    pr = problem.proj
    L = int(lms.x.shape[0])
    ref_pose = np.asarray(lms.ref_pose)
    # order landmarks by reference pose (stable keeps build order within a
    # pose); padding slots sort with their ref_pose 0 but are inert
    order = np.argsort(ref_pose, kind="stable")
    L_new = -(-L // n_shards) * n_shards
    Lk = L_new // n_shards

    inv = np.zeros(L, np.int64)
    inv[order] = np.arange(L)

    def permute_lms(a):
        a = np.asarray(a)
        out = a[order]
        if L_new > L:
            pad = np.zeros((L_new - L,) + a.shape[1:], a.dtype)
            out = np.concatenate([out, pad], 0)
        return jnp.asarray(out)

    lms_new = dataclasses.replace(
        lms,
        x=permute_lms(lms.x), x_w=permute_lms(lms.x_w),
        ref_pose=permute_lms(lms.ref_pose),
        ref_cam=permute_lms(lms.ref_cam),
        active=permute_lms(lms.active),
        reliable=permute_lms(lms.reliable),
        z_ref=permute_lms(lms.z_ref),
        has_z_ref=permute_lms(lms.has_z_ref))

    # regroup projection rows by owning shard
    lm_old = np.asarray(pr.lm)
    valid = np.asarray(pr.valid)
    lm_new_ids = inv[lm_old]
    owner = lm_new_ids // Lk

    buckets = [np.flatnonzero(valid & (owner == k)) for k in range(n_shards)]
    per = max(max((len(b) for b in buckets), default=1), 1)

    def regroup(a, fill=0):
        a = np.asarray(a)
        out = np.full((n_shards * per,) + a.shape[1:], fill, a.dtype)
        for k, b in enumerate(buckets):
            out[k * per: k * per + len(b)] = a[b]
        return out

    pose_new = regroup(pr.pose)
    z_new = regroup(pr.z)
    cam_new = regroup(pr.cam)
    weight_new = regroup(pr.weight)
    cond_new = regroup(pr.cond)
    valid_new = np.zeros(n_shards * per, bool)
    lm_col = np.zeros(n_shards * per, np.int32)
    for k, b in enumerate(buckets):
        valid_new[k * per: k * per + len(b)] = True
        lm_col[k * per: k * per + len(b)] = lm_new_ids[b]
        # padding rows must index inside the shard's own chunk so the
        # shard-local re-indexing stays in range
        lm_col[k * per + len(b): (k + 1) * per] = k * Lk

    # refresh the sparsity tables for the new row/landmark numbering
    ref_new = np.asarray(lms_new.ref_pose)[lm_col]
    per_row, pidx = build_structure_index(
        pose_new, ref_new, lm_col, valid_new,
        np.asarray(problem.binary.pose1), np.asarray(problem.binary.pose2),
        np.asarray(problem.binary.valid),
        np.asarray(problem.imu.pose1), np.asarray(problem.imu.pose2),
        np.asarray(problem.imu.valid),
        int(problem.poses.q.shape[0]), L_new, pad_multiple=1)

    proj_new = dataclasses.replace(
        pr,
        z=jnp.asarray(z_new), pose=jnp.asarray(pose_new),
        lm=jnp.asarray(lm_col), cam=jnp.asarray(cam_new),
        weight=jnp.asarray(weight_new), valid=jnp.asarray(valid_new),
        cond=jnp.asarray(cond_new),
        pair=jnp.asarray(per_row["pair"]),
        pair_swap=jnp.asarray(per_row["pair_swap"]),
        wb_meas=jnp.asarray(per_row["wb_meas"]),
        wb_ref=jnp.asarray(per_row["wb_ref"]))
    binary_new = dataclasses.replace(
        problem.binary, pair=jnp.asarray(per_row["bpair"]),
        pair_swap=jnp.asarray(per_row["bswap"]))
    imu_new = dataclasses.replace(
        problem.imu, pair=jnp.asarray(per_row["ipair"]),
        pair_swap=jnp.asarray(per_row["iswap"]))

    return dataclasses.replace(problem, lms=lms_new, proj=proj_new,
                               binary=binary_new, imu=imu_new, pidx=pidx)
