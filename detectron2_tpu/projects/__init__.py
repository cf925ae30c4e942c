"""Project families built on the core framework
(reference detectron2/projects/__init__.py namespace hook).

Unlike the reference (which path-hacks an out-of-tree ``projects/`` dir into
the ``detectron2.projects`` namespace), projects here are ordinary
subpackages: ``from detectron2_tpu.projects import deeplab``. Importing a
project registers its heads/backbones into the shared registries.
"""
