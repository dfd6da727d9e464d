"""Headless screenshot/video pipeline (reference Application.hpp:254-272
screenshot save + make_video.sh assembly, redesigned as matplotlib
rasterization + ffmpeg-or-GIF)."""

import os

import numpy as np


def test_render_trajectory_and_video(tmp_path):
    from admm_elastic_tpu.geometry.factory import make_tet_blocks
    from admm_elastic_tpu.geometry.mesh import surface_faces_from_tets
    from admm_elastic_tpu.utils.render import render_trajectory

    mesh = make_tet_blocks(2, 2, 2)
    faces = surface_faces_from_tets(mesh.tets)
    x0 = mesh.vertices.astype(np.float64)
    traj = np.stack([x0 + [0, -0.1 * k, 0] for k in range(3)])

    out = tmp_path / "frames"
    video = tmp_path / "drop.mp4"
    paths = render_trajectory(traj, [(0, len(x0), faces)], str(out),
                              video=str(video), floor_y=-1.0)
    # Reference frame naming %05d.png.
    for k in range(3):
        p = out / f"{k:05d}.png"
        assert p.exists() and p.stat().st_size > 1000, p
    # Video assembled (mp4 via ffmpeg if present, else .gif fallback).
    assert os.path.exists(paths[-1]) and os.path.getsize(paths[-1]) > 1000
    assert paths[-1].endswith((".mp4", ".gif"))
