#!/usr/bin/env python
"""DensePose Apply Net CLI (reference projects/DensePose/apply_net.py).

Usage:
  python tools/densepose/apply_net.py dump configs/DensePose/densepose_rcnn_R_50_FPN_s1x.yaml \
      model.pkl image.jpg --output results.pkl
  python tools/densepose/apply_net.py show <cfg> <model> <input> dp_contour,bbox --output out.png
"""

from detectron2_tpu.projects.densepose.apply_net import main

if __name__ == "__main__":
    main()
