// Pybind shim exposing the REFERENCE detectron2 COCOeval C++ implementation
// (/root/reference/detectron2/layers/csrc/cocoeval/cocoeval.cpp) as a torch
// CPU extension, so dev/make_cocoeval_reference_goldens.py can run the real
// upstream metric code as an oracle. The reference sources are compiled
// in-place from /root/reference (read-only) — nothing is copied into this
// repo; only the derived golden arrays are vendored (tests/goldens/).
#include <torch/extension.h>

#include "cocoeval.h" // reference header, via extra_include_paths

namespace ce = detectron2::COCOeval;

PYBIND11_MODULE(TORCH_EXTENSION_NAME, m) {
  m.def("COCOevalEvaluateImages", &ce::EvaluateImages);
  m.def("COCOevalAccumulate", &ce::Accumulate);
  pybind11::class_<ce::InstanceAnnotation>(m, "InstanceAnnotation")
      .def(pybind11::init<uint64_t, double, double, bool, bool>());
  pybind11::class_<ce::ImageEvaluation>(m, "ImageEvaluation");
}
