#!/usr/bin/env python
"""DensePose Query DB CLI (reference projects/DensePose/query_db.py).

Usage:
  python tools/densepose/query_db.py print densepose_coco_2014_minival 'image_id:int=18-25'
  python tools/densepose/query_db.py show densepose_coco_2014_minival '*' dp_segm,bbox --max-entries 3
"""

import detectron2_tpu.data.datasets  # noqa: register builtin datasets
import detectron2_tpu.projects.densepose  # noqa: register densepose datasets
from detectron2_tpu.projects.densepose.query_db import main

if __name__ == "__main__":
    main()
