// SPDX-License-Identifier: Apache-2.0
//
// Example native gain plugin (SDK conformance example, like the reference's
// examples/plugins gain family). Multiplies audio samples by a tunable gain.
//
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

#include "../../sdk/streamkit_plugin_sdk.hpp"

namespace {

// minimal "gain": <float> extraction from a JSON object (no deps)
double parse_gain(const char* json, double fallback) {
  if (!json) return fallback;
  const char* p = std::strstr(json, "\"gain\"");
  if (!p) return fallback;
  p = std::strchr(p, ':');
  if (!p) return fallback;
  return std::atof(p + 1);
}

class GainPlugin : public sk::ProcessorPlugin {
 public:
  bool init(const char* params_json, std::string* error) override {
    gain_ = parse_gain(params_json, 1.0);
    if (gain_ < 0.0 || gain_ > 4.0) {
      *error = "gain must be in [0, 4]";
      return false;
    }
    return true;
  }

  int process(const char* pin, const SkPacket* pkt, const sk::Emitter& emit) override {
    (void)pin;
    if (pkt->kind != SK_PACKET_AUDIO) return 0;  // pass non-audio silently
    buf_.assign(pkt->samples, pkt->samples + pkt->n_samples);
    const float g = static_cast<float>(gain_);
    for (float& s : buf_) s *= g;
    emit.send_audio("out", buf_.data(), buf_.size(), pkt->sample_rate,
                    pkt->channels, pkt->duration_us, pkt->sequence);
    ++processed_;
    return 0;
  }

  int update_params(const char* params_json) override {
    double g = parse_gain(params_json, gain_);
    if (g < 0.0 || g > 4.0) return 1;
    gain_ = g;
    return 0;
  }

  int flush(const sk::Emitter& emit) override {
    char msg[64];
    std::snprintf(msg, sizeof msg, "{\"processed\": %zu}", processed_);
    (void)msg;  // flush has no telemetry callback; nothing buffered to emit
    return 0;
  }

 private:
  double gain_ = 1.0;
  std::vector<float> buf_;
  size_t processed_ = 0;
};

}  // namespace

SK_PLUGIN_ENTRY(GainPlugin, "plugin::native::gain_cpp",
                "Example native C++ gain plugin")
