// SPDX-License-Identifier: Apache-2.0
//
// StreamKit-TPU C++ plugin SDK (header-only).
//
// Counterpart of the reference's native SDK (sdks/plugin-sdk/native/src/
// lib.rs:288-427: NativeProcessorNode trait + native_plugin_entry! macro):
// derive from sk::ProcessorPlugin, then instantiate the vtable with
// SK_PLUGIN_ENTRY(MyPlugin, "kind", "description").
//
#pragma once

#include <cstring>
#include <memory>
#include <string>

#include "../include/streamkit_plugin.h"

namespace sk {

// Emission helper handed to process()/flush().
class Emitter {
 public:
  Emitter(SkOutputCallback out, SkTelemetryCallback tel, void* ctx)
      : out_(out), tel_(tel), ctx_(ctx) {}

  void send(const char* pin, const SkPacket& pkt) const {
    if (out_) out_(ctx_, pin, &pkt);
  }

  void send_audio(const char* pin, const float* samples, size_t n,
                  int32_t rate, int32_t channels, int64_t duration_us = -1,
                  int64_t sequence = -1) const {
    SkPacket p{};
    p.kind = SK_PACKET_AUDIO;
    p.samples = samples;
    p.n_samples = n;
    p.sample_rate = rate;
    p.channels = channels;
    p.timestamp_us = -1;
    p.duration_us = duration_us;
    p.sequence = sequence;
    send(pin, p);
  }

  void send_text(const char* pin, const std::string& text) const {
    SkPacket p{};
    p.kind = SK_PACKET_TEXT;
    p.text = text.c_str();
    p.timestamp_us = p.duration_us = p.sequence = -1;
    send(pin, p);
  }

  void telemetry(const char* event_type, const std::string& json) const {
    if (tel_) tel_(ctx_, event_type, json.c_str());
  }

 private:
  SkOutputCallback out_;
  SkTelemetryCallback tel_;
  void* ctx_;
};

// Base class for plugins.
class ProcessorPlugin {
 public:
  virtual ~ProcessorPlugin() = default;
  // Return false + set error to fail construction.
  virtual bool init(const char* params_json, std::string* error) { return true; }
  virtual int process(const char* pin, const SkPacket* pkt, const Emitter& emit) = 0;
  virtual int update_params(const char* params_json) { return 0; }
  virtual int flush(const Emitter& emit) { return 0; }
};

namespace detail {

template <typename T>
void* create_impl(const char* params_json, char* err, size_t err_len) {
  auto plugin = std::make_unique<T>();
  std::string error;
  if (!plugin->init(params_json, &error)) {
    if (err && err_len > 0) {
      std::strncpy(err, error.c_str(), err_len - 1);
      err[err_len - 1] = '\0';
    }
    return nullptr;
  }
  return plugin.release();
}

template <typename T>
int32_t process_impl(void* handle, const char* pin, const SkPacket* pkt,
                     SkOutputCallback out, SkTelemetryCallback tel, void* ctx) {
  return static_cast<T*>(handle)->process(pin, pkt, Emitter(out, tel, ctx));
}

template <typename T>
int32_t update_params_impl(void* handle, const char* params_json) {
  return static_cast<T*>(handle)->update_params(params_json);
}

template <typename T>
int32_t flush_impl(void* handle, SkOutputCallback out, void* ctx) {
  return static_cast<T*>(handle)->flush(Emitter(out, nullptr, ctx));
}

template <typename T>
void destroy_impl(void* handle) {
  delete static_cast<T*>(handle);
}

}  // namespace detail
}  // namespace sk

// Generates the exported vtable (reference native_plugin_entry! analog).
#define SK_PLUGIN_ENTRY(PluginType, kind_str, description_str)               \
  extern "C" const SkPluginApi* streamkit_tpu_plugin_api(void) {             \
    static const SkPluginApi api = {                                         \
        SK_PLUGIN_ABI_VERSION,                                               \
        kind_str,                                                            \
        description_str,                                                     \
        nullptr,                                                             \
        &sk::detail::create_impl<PluginType>,                                \
        &sk::detail::process_impl<PluginType>,                               \
        &sk::detail::update_params_impl<PluginType>,                         \
        &sk::detail::flush_impl<PluginType>,                                 \
        &sk::detail::destroy_impl<PluginType>,                               \
    };                                                                       \
    return &api;                                                             \
  }
