from matryodshka_tpu.geometry import grids, cameras, intersect, sweep, render, homography  # noqa: F401
