"""Headless visualization: the TPU build's replacement for the Pangolin
viewer stack (src/Viewer.cc, src/FrameDrawer.cc, src/MapDrawer.cc).

Instead of a GUI thread, rendering is pure-numpy rasterization to PNG
files: per-frame 2D overlays (FrameDrawer parity) and virtual-camera 3D
map renders (MapDrawer parity — points, keyframe frusta, covisibility
graph, semi-dense cloud, cuboid/quadric object landmarks). The viewer
menu's toggles (src/Viewer.cc:69-93) become ViewerOptions fields.
"""

from eao_slam_tpu.viz.frame_drawer import draw_frame
from eao_slam_tpu.viz.map_drawer import MapRenderOptions, render_map
from eao_slam_tpu.viz.raster import save_png
from eao_slam_tpu.viz.viewer import HeadlessViewer, ViewerOptions

__all__ = [
    "draw_frame",
    "render_map",
    "MapRenderOptions",
    "save_png",
    "HeadlessViewer",
    "ViewerOptions",
]
