#include "csrc/base/nnet.h"

#include <Python.h>

#include <cstring>

#include "csrc/utils/log.h"

namespace aps {

namespace {

void EnsurePython() {
  if (!Py_IsInitialized()) {
    Py_InitializeEx(0);
  }
}

}  // namespace

PyNnet::PyNnet(const std::string& cpt_dir, const std::string& function,
               const std::string& cpt_tag) {
  EnsurePython();
  PyObject* module = PyImport_ImportModule("aps_tpu.deploy");
  if (module == nullptr) {
    PyErr_Print();
    LOG_FAIL << "Can not import aps_tpu.deploy (is aps_tpu installed?)";
  }
  PyObject* cls = PyObject_GetAttrString(module, "RtModel");
  ASSERT(cls != nullptr);
  PyObject* args = Py_BuildValue("(sss)", cpt_dir.c_str(), function.c_str(),
                                 cpt_tag.c_str());
  PyObject* inst = PyObject_CallObject(cls, args);
  if (inst == nullptr) {
    PyErr_Print();
    LOG_FAIL << "Failed to construct RtModel(" << cpt_dir << ")";
  }
  Py_DECREF(args);
  Py_DECREF(cls);
  Py_DECREF(module);
  model_ = inst;
}

PyNnet::~PyNnet() {
  if (model_ != nullptr && Py_IsInitialized())
    Py_DECREF(reinterpret_cast<PyObject*>(model_));
}

bool PyNnet::Forward(const float* feats, int32_t num_frames, int32_t dim,
                     std::vector<float>* out,
                     std::vector<int64_t>* out_shape) {
  PyObject* inst = reinterpret_cast<PyObject*>(model_);
  PyObject* bytes = PyBytes_FromStringAndSize(
      reinterpret_cast<const char*>(feats),
      static_cast<Py_ssize_t>(sizeof(float)) * num_frames * dim);
  PyObject* result = PyObject_CallMethod(inst, "forward_bytes", "(Oii)",
                                         bytes, num_frames, dim);
  Py_DECREF(bytes);
  if (result == nullptr) {
    PyErr_Print();
    return false;
  }
  // result: (bytes, shape tuple)
  PyObject* data = PyTuple_GetItem(result, 0);
  PyObject* shape = PyTuple_GetItem(result, 1);
  char* buf;
  Py_ssize_t size;
  PyBytes_AsStringAndSize(data, &buf, &size);
  out->resize(size / sizeof(float));
  std::memcpy(out->data(), buf, size);
  out_shape->clear();
  for (Py_ssize_t i = 0; i < PyTuple_Size(shape); ++i)
    out_shape->push_back(PyLong_AsLongLong(PyTuple_GetItem(shape, i)));
  Py_DECREF(result);
  return true;
}

PySeparator::PySeparator(const std::string& cpt_dir,
                         const std::string& cpt_tag) {
  EnsurePython();
  PyObject* module = PyImport_ImportModule("aps_tpu.deploy");
  if (module == nullptr) {
    PyErr_Print();
    LOG_FAIL << "Can not import aps_tpu.deploy (is aps_tpu installed?)";
  }
  PyObject* cls = PyObject_GetAttrString(module, "RtSeparator");
  ASSERT(cls != nullptr);
  PyObject* args = Py_BuildValue("(ss)", cpt_dir.c_str(), cpt_tag.c_str());
  PyObject* inst = PyObject_CallObject(cls, args);
  if (inst == nullptr) {
    PyErr_Print();
    LOG_FAIL << "Failed to construct RtSeparator(" << cpt_dir << ")";
  }
  Py_DECREF(args);
  Py_DECREF(cls);
  Py_DECREF(module);
  model_ = inst;
}

PySeparator::~PySeparator() {
  if (model_ != nullptr && Py_IsInitialized())
    Py_DECREF(reinterpret_cast<PyObject*>(model_));
}

bool PySeparator::Enhance(const float* samples, int32_t num_samples,
                          std::vector<float>* out,
                          std::vector<int64_t>* out_shape) {
  PyObject* inst = reinterpret_cast<PyObject*>(model_);
  PyObject* bytes = PyBytes_FromStringAndSize(
      reinterpret_cast<const char*>(samples),
      static_cast<Py_ssize_t>(sizeof(float)) * num_samples);
  PyObject* result = PyObject_CallMethod(inst, "enhance_bytes", "(Oi)",
                                         bytes, num_samples);
  Py_DECREF(bytes);
  if (result == nullptr) {
    PyErr_Print();
    return false;
  }
  PyObject* data = PyTuple_GetItem(result, 0);
  PyObject* shape = PyTuple_GetItem(result, 1);
  char* buf;
  Py_ssize_t size;
  PyBytes_AsStringAndSize(data, &buf, &size);
  out->resize(size / sizeof(float));
  std::memcpy(out->data(), buf, size);
  out_shape->clear();
  for (Py_ssize_t i = 0; i < PyTuple_Size(shape); ++i)
    out_shape->push_back(PyLong_AsLongLong(PyTuple_GetItem(shape, i)));
  Py_DECREF(result);
  return true;
}

}  // namespace aps
