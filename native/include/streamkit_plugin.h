/* SPDX-License-Identifier: Apache-2.0
 *
 * StreamKit-TPU native plugin C ABI, version 2.
 *
 * Counterpart of the reference's C ABI (sdks/plugin-sdk/native/src/types.rs:
 * 13,206: CNativePluginAPI / CPacket / CAudioFrame): a plugin is a shared
 * library exporting  streamkit_tpu_plugin_api()  returning a vtable. The
 * Python host (streamkit_tpu/plugins/native.py) dlopens the library,
 * version-checks, and adapts it to a ProcessorNode; every FFI call runs on
 * an executor thread (the reference uses spawn_blocking).
 */
#ifndef STREAMKIT_TPU_PLUGIN_H
#define STREAMKIT_TPU_PLUGIN_H

#include <stddef.h>
#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

#define SK_PLUGIN_ABI_VERSION 2u

/* Packet payload kinds (matches the core Packet variants). */
enum SkPacketKind {
  SK_PACKET_AUDIO = 0,
  SK_PACKET_TEXT = 1,
  SK_PACKET_TRANSCRIPTION = 2,
  SK_PACKET_CUSTOM = 3,
  SK_PACKET_BINARY = 4,
};

typedef struct SkPacket {
  int32_t kind; /* SkPacketKind */
  /* audio */
  const float* samples; /* interleaved f32 */
  size_t n_samples;
  int32_t sample_rate;
  int32_t channels;
  /* text / transcription (utf-8) */
  const char* text;
  /* custom: namespaced type id + JSON payload (utf-8) */
  const char* type_id;
  const char* json;
  /* binary */
  const uint8_t* data;
  size_t data_len;
  const char* content_type;
  /* metadata: negative = unset */
  int64_t timestamp_us;
  int64_t duration_us;
  int64_t sequence;
} SkPacket;

/* Host-provided callbacks; ctx is the host's opaque pointer. */
typedef void (*SkOutputCallback)(void* ctx, const char* pin, const SkPacket* pkt);
typedef void (*SkTelemetryCallback)(void* ctx, const char* event_type,
                                    const char* json_data);

typedef struct SkPluginApi {
  uint32_t abi_version; /* must equal SK_PLUGIN_ABI_VERSION */
  const char* kind;     /* e.g. "plugin::native::gain_cpp" */
  const char* description;
  const char* param_schema_json; /* may be NULL */

  /* Create an instance from JSON params; on failure return NULL and write a
   * message into err (err_len bytes). */
  void* (*create)(const char* params_json, char* err, size_t err_len);

  /* Process one packet; emit zero or more outputs via out(). Return 0 on
   * success, nonzero on error. */
  int32_t (*process)(void* handle, const char* pin, const SkPacket* pkt,
                     SkOutputCallback out, SkTelemetryCallback telemetry,
                     void* ctx);

  /* Live parameter update (JSON). Return 0 on success. */
  int32_t (*update_params)(void* handle, const char* params_json);

  /* Input finished: flush buffered state, emitting via out(). */
  int32_t (*flush)(void* handle, SkOutputCallback out, void* ctx);

  void (*destroy)(void* handle);
} SkPluginApi;

/* The single entry point every plugin exports. */
const SkPluginApi* streamkit_tpu_plugin_api(void);

#ifdef __cplusplus
} /* extern "C" */
#endif

#endif /* STREAMKIT_TPU_PLUGIN_H */
