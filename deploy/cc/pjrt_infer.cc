// TPU serving client — the TPU-native counterpart of the reference's
// TensorRT C++ demo (/root/reference/deploy/trt_cc/demo_yolox.cc:
// engine load -> doInference:348 -> decode -> NMS). Here the "engine" is a
// PJRT plugin (libtpu / axon tunnel / any conforming backend) and the
// program is the MLIR module exported by export.py --emit-mlir, with its
// serialized CompileOptions sidecar.
//
// Flow: dlopen(plugin) -> GetPjrtApi -> PJRT_Client_Create ->
// PJRT_Client_Compile(mlir) -> host->device transfer ->
// PJRT_LoadedExecutable_Execute -> device->host -> raw f32 outputs on stdout
// (decode+NMS are fused into the exported graph by --fuse-postprocess, so
// this client stays model-agnostic — no hand-written decode like the
// reference's generate_yolox_proposals).
//
// Build: make -C deploy/cc     Run: ./pjrt_infer <plugin.so> <model.mlir> \
//   <compile_options.pb> <input.raw> <n_floats_in> <n_floats_out>

#include <dlfcn.h>

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <string>
#include <vector>

#include "xla/pjrt/c/pjrt_c_api.h"

#define CHECK_PJRT(api, expr)                                        \
  do {                                                               \
    PJRT_Error* _err = (expr);                                       \
    if (_err) {                                                      \
      PJRT_Error_Message_Args _m;                                    \
      _m.struct_size = PJRT_Error_Message_Args_STRUCT_SIZE;          \
      _m.extension_start = nullptr;                                  \
      _m.error = _err;                                               \
      api->PJRT_Error_Message(&_m);                                  \
      std::fprintf(stderr, "PJRT error: %.*s\n",                     \
                   static_cast<int>(_m.message_size), _m.message);   \
      PJRT_Error_Destroy_Args _d;                                    \
      _d.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;          \
      _d.extension_start = nullptr;                                  \
      _d.error = _err;                                               \
      api->PJRT_Error_Destroy(&_d);                                  \
      std::exit(1);                                                  \
    }                                                                \
  } while (0)

static std::string read_file(const char* path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) {
    std::fprintf(stderr, "cannot open %s\n", path);
    std::exit(1);
  }
  return std::string((std::istreambuf_iterator<char>(f)),
                     std::istreambuf_iterator<char>());
}

int main(int argc, char** argv) {
  if (argc < 7) {
    std::fprintf(stderr,
                 "usage: %s <plugin.so> <model.mlir> <compile_options.pb> "
                 "<input.raw f32> <n_in> <n_out> [key=value ...]\n"
                 "  trailing key=value pairs become PJRT client create\n"
                 "  options (ints auto-detected), e.g. the axon tunnel's\n"
                 "  topology=v5e:1x1x1 session_id=... remote_compile=1\n",
                 argv[0]);
    return 2;
  }
  const char* plugin_path = argv[1];
  std::string mlir = read_file(argv[2]);
  std::string compile_opts = read_file(argv[3]);
  std::string input_raw = read_file(argv[4]);
  const size_t n_in = std::strtoull(argv[5], nullptr, 10);
  const size_t n_out = std::strtoull(argv[6], nullptr, 10);
  if (input_raw.size() != n_in * sizeof(float)) {
    std::fprintf(stderr, "input size mismatch: %zu bytes vs %zu floats\n",
                 input_raw.size(), n_in);
    return 2;
  }

  void* handle = dlopen(plugin_path, RTLD_NOW | RTLD_LOCAL);
  if (!handle) {
    std::fprintf(stderr, "dlopen failed: %s\n", dlerror());
    return 1;
  }
  auto get_api = reinterpret_cast<const PJRT_Api* (*)()>(
      dlsym(handle, "GetPjrtApi"));
  if (!get_api) {
    std::fprintf(stderr, "GetPjrtApi not found in plugin\n");
    return 1;
  }
  const PJRT_Api* api = get_api();

  // optional plugin-wide init
  if (api->PJRT_Plugin_Initialize) {
    PJRT_Plugin_Initialize_Args ia;
    ia.struct_size = PJRT_Plugin_Initialize_Args_STRUCT_SIZE;
    ia.extension_start = nullptr;
    CHECK_PJRT(api, api->PJRT_Plugin_Initialize(&ia));
  }

  // named create options from trailing key=value args
  std::vector<PJRT_NamedValue> named;
  std::vector<std::string> kv_storage;
  kv_storage.reserve((argc - 7) * 2);
  for (int i = 7; i < argc; ++i) {
    const char* eq = std::strchr(argv[i], '=');
    if (!eq) continue;
    kv_storage.emplace_back(argv[i], eq - argv[i]);       // key
    kv_storage.emplace_back(eq + 1);                       // value
  }
  for (size_t i = 0; i + 1 < kv_storage.size(); i += 2) {
    const std::string& key = kv_storage[i];
    const std::string& val = kv_storage[i + 1];
    PJRT_NamedValue nv;
    std::memset(&nv, 0, sizeof(nv));
    nv.struct_size = PJRT_NamedValue_STRUCT_SIZE;
    nv.name = key.c_str();
    nv.name_size = key.size();
    char* end = nullptr;
    long long as_int = std::strtoll(val.c_str(), &end, 10);
    if (end && *end == '\0' && !val.empty()) {
      nv.type = PJRT_NamedValue_kInt64;
      nv.int64_value = as_int;
      nv.value_size = 1;
    } else {
      nv.type = PJRT_NamedValue_kString;
      nv.string_value = val.c_str();
      nv.value_size = val.size();
    }
    named.push_back(nv);
  }

  PJRT_Client_Create_Args cc;
  std::memset(&cc, 0, sizeof(cc));
  cc.struct_size = PJRT_Client_Create_Args_STRUCT_SIZE;
  cc.create_options = named.empty() ? nullptr : named.data();
  cc.num_options = named.size();
  CHECK_PJRT(api, api->PJRT_Client_Create(&cc));
  PJRT_Client* client = cc.client;

  // compile the MLIR module
  PJRT_Program program;
  std::memset(&program, 0, sizeof(program));
  program.struct_size = PJRT_Program_STRUCT_SIZE;
  program.code = mlir.data();
  program.code_size = mlir.size();
  static const char kFormat[] = "mlir";
  program.format = kFormat;
  program.format_size = sizeof(kFormat) - 1;

  PJRT_Client_Compile_Args comp;
  std::memset(&comp, 0, sizeof(comp));
  comp.struct_size = PJRT_Client_Compile_Args_STRUCT_SIZE;
  comp.client = client;
  comp.program = &program;
  comp.compile_options = compile_opts.data();
  comp.compile_options_size = compile_opts.size();
  CHECK_PJRT(api, api->PJRT_Client_Compile(&comp));
  PJRT_LoadedExecutable* exec = comp.executable;
  std::fprintf(stderr, "compiled %s (%zu bytes mlir)\n", argv[2],
               mlir.size());

  // first addressable device
  PJRT_Client_AddressableDevices_Args da;
  std::memset(&da, 0, sizeof(da));
  da.struct_size = PJRT_Client_AddressableDevices_Args_STRUCT_SIZE;
  da.client = client;
  CHECK_PJRT(api, api->PJRT_Client_AddressableDevices(&da));
  PJRT_Device* device = da.addressable_devices[0];

  // host -> device
  int64_t dims[1] = {static_cast<int64_t>(n_in)};
  PJRT_Client_BufferFromHostBuffer_Args hb;
  std::memset(&hb, 0, sizeof(hb));
  hb.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
  hb.client = client;
  hb.data = input_raw.data();
  hb.type = PJRT_Buffer_Type_F32;
  hb.dims = dims;
  hb.num_dims = 1;
  hb.host_buffer_semantics =
      PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes;
  hb.device = device;
  CHECK_PJRT(api, api->PJRT_Client_BufferFromHostBuffer(&hb));
  if (hb.done_with_host_buffer) {
    PJRT_Event_Await_Args ea;
    std::memset(&ea, 0, sizeof(ea));
    ea.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
    ea.event = hb.done_with_host_buffer;
    CHECK_PJRT(api, api->PJRT_Event_Await(&ea));
    PJRT_Event_Destroy_Args ed;
    std::memset(&ed, 0, sizeof(ed));
    ed.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
    ed.event = hb.done_with_host_buffer;
    api->PJRT_Event_Destroy(&ed);
  }
  PJRT_Buffer* in_buf = hb.buffer;

  // execute
  PJRT_ExecuteOptions opts;
  std::memset(&opts, 0, sizeof(opts));
  opts.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;
  PJRT_Buffer* arg_list[1] = {in_buf};
  PJRT_Buffer* const* args_per_device[1] = {arg_list};
  PJRT_Buffer* out_list[8] = {nullptr};
  PJRT_Buffer** outs_per_device[1] = {out_list};

  PJRT_LoadedExecutable_Execute_Args ex;
  std::memset(&ex, 0, sizeof(ex));
  ex.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
  ex.executable = exec;
  ex.options = &opts;
  ex.argument_lists = args_per_device;
  ex.num_devices = 1;
  ex.num_args = 1;
  ex.output_lists = outs_per_device;
  CHECK_PJRT(api, api->PJRT_LoadedExecutable_Execute(&ex));

  // device -> host (first output)
  std::vector<float> out(n_out);
  PJRT_Buffer_ToHostBuffer_Args th;
  std::memset(&th, 0, sizeof(th));
  th.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
  th.src = out_list[0];
  th.dst = out.data();
  th.dst_size = out.size() * sizeof(float);
  CHECK_PJRT(api, api->PJRT_Buffer_ToHostBuffer(&th));
  if (th.event) {
    PJRT_Event_Await_Args ea;
    std::memset(&ea, 0, sizeof(ea));
    ea.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
    ea.event = th.event;
    CHECK_PJRT(api, api->PJRT_Event_Await(&ea));
  }

  for (size_t i = 0; i < n_out && i < 16; ++i) {
    std::printf("%f%c", out[i], (i + 1 == n_out || i == 15) ? '\n' : ' ');
  }
  std::fprintf(stderr, "OK: executed, %zu output floats\n", n_out);
  return 0;
}
