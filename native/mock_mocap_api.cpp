// Mock Noitom MocapApi vendor library.
//
// Implements the subset of the MocapApi C ABI that
// robustcap_tpu/sensors/noitom.py binds: MCPGetGenericInterface hands out
// procedure tables (structs of function pointers) for the application,
// settings, sensor-module, avatar, joint, and rigid-body interfaces. The
// mock emulates a Perception Neuron session: after OpenApplication the
// first poll reports 6 SensorModulesUpdated events; sensor postures are
// deterministic unit quaternions advancing each poll; one avatar with a
// 3-joint hierarchy (Hips -> Spine, RightUpLeg) exercises the skeleton
// paths. Built by tests (g++ -shared -fPIC) so the Python FFI is driven
// end-to-end without the proprietary SDK.
//
// ABI notes: every function returns EMCPError (int32); handles are opaque
// uint64; MCPEvent is {u32 size; i32 event_type; f64 timestamp;
// 48-byte union} = 64 bytes.

#include <cmath>
#include <cstdint>
#include <cstring>

typedef int32_t EMCPError;
typedef uint64_t Handle;

static const EMCPError kNoError = 0;
static const EMCPError kInvalidHandle = 4;
static const EMCPError kInvalidParameter = 5;
static const EMCPError kNoneMessage = 12;
static const EMCPError kServerNotReady = 16;

struct MCPEvent {
  uint32_t size;
  int32_t event_type;
  double timestamp;
  union {
    uint64_t reserved[6];
    struct { Handle avatar_handle; } motion_data;
    struct { uint32_t error; uint64_t info0; } system_error;
    struct { Handle sensor_module_handle; } sensor_module_data;
  } data;
};
static_assert(sizeof(MCPEvent) == 64, "MCPEvent ABI drift");

static const int32_t kEvtAvatarUpdated = 256;
static const int32_t kEvtSensorModulesUpdated = 1024;

// ---------------------------------------------------------------------------
// mock session state
// ---------------------------------------------------------------------------

static const int kNumSensors = 6;
static const Handle kAppHandle = 1;
static const Handle kSettingsHandle = 11;
static const Handle kAvatarHandle = 201;
static const Handle kSensorBase = 100;  // sensors 101..106
static const Handle kJointHips = 301, kJointSpine = 302, kJointRightUpLeg = 303;

struct MockState {
  bool app_created = false;
  bool app_open = false;
  bool settings_created = false;
  bool udp_set = false;
  bool calc_data = false;
  bool cache_events = false;
  int poll_count = 0;
  int frame = 0;
  uint16_t udp_port = 0;
};
static MockState g;

static bool is_sensor(Handle h) {
  return h > kSensorBase && h <= kSensorBase + kNumSensors;
}

static void sensor_signal(Handle h, int frame, float* quat_wxyz,
                          float* acc) {
  int id = static_cast<int>(h - kSensorBase);
  float ang = 0.05f * frame + 0.3f * id;
  quat_wxyz[0] = std::cos(ang / 2);
  quat_wxyz[1] = std::sin(ang / 2);
  quat_wxyz[2] = 0.f;
  quat_wxyz[3] = 0.f;
  acc[0] = 0.1f * id;
  acc[1] = 0.2f * std::sin(ang);
  acc[2] = 9.8f;
}

// ---------------------------------------------------------------------------
// application interface
// ---------------------------------------------------------------------------

static EMCPError CreateApplication(Handle* h) {
  g = MockState();
  g.app_created = true;
  *h = kAppHandle;
  return kNoError;
}
static EMCPError DestroyApplication(Handle h) {
  if (h != kAppHandle || !g.app_created) return kInvalidHandle;
  g.app_created = false;
  return kNoError;
}
static EMCPError SetApplicationSettings(Handle settings, Handle app) {
  if (app != kAppHandle || settings != kSettingsHandle) return kInvalidHandle;
  return kNoError;
}
static EMCPError SetApplicationRenderSettings(Handle, Handle) {
  return kNoError;
}
static EMCPError OpenApplication(Handle h) {
  if (h != kAppHandle) return kInvalidHandle;
  if (!g.udp_set || !g.calc_data) return kServerNotReady;
  g.app_open = true;
  g.poll_count = 0;
  return kNoError;
}
static EMCPError EnableApplicationCacheEvents(Handle) {
  g.cache_events = true;
  return kNoError;
}
static EMCPError DisableApplicationCacheEvents(Handle) {
  g.cache_events = false;
  return kNoError;
}
static EMCPError ApplicationCacheEventsIsEnabled(bool* on, Handle) {
  *on = g.cache_events;
  return kNoError;
}
static EMCPError CloseApplication(Handle h) {
  if (h != kAppHandle) return kInvalidHandle;
  g.app_open = false;
  return kNoError;
}
static EMCPError GetApplicationRigidBodies(Handle* out, uint32_t* n,
                                           Handle) {
  *n = 0;
  (void)out;
  return kNoError;
}
static EMCPError GetApplicationAvatars(Handle* out, uint32_t* n, Handle h) {
  if (h != kAppHandle) return kInvalidHandle;
  *n = 1;
  if (out) out[0] = kAvatarHandle;
  return kNoError;
}
static EMCPError GetApplicationSensorModules(Handle* out, uint32_t* n,
                                             Handle h) {
  if (h != kAppHandle) return kInvalidHandle;
  *n = kNumSensors;
  if (out)
    for (int i = 0; i < kNumSensors; ++i) out[i] = kSensorBase + 1 + i;
  return kNoError;
}
static EMCPError PollApplicationNextEvent(MCPEvent* events, uint32_t* n,
                                          Handle h) {
  if (h != kAppHandle) return kInvalidHandle;
  if (!g.app_open) {
    *n = 0;
    return kNoneMessage;
  }
  uint32_t cap = *n;
  uint32_t count = 0;
  double t = 0.01 * g.poll_count;
  if (g.poll_count == 0) {
    // session start: announce every sensor module
    for (int i = 0; i < kNumSensors && count < cap; ++i, ++count) {
      events[count].event_type = kEvtSensorModulesUpdated;
      events[count].timestamp = t;
      events[count].data.sensor_module_data.sensor_module_handle =
          kSensorBase + 1 + i;
    }
  } else if (count < cap) {
    events[count].event_type = kEvtAvatarUpdated;
    events[count].timestamp = t;
    events[count].data.motion_data.avatar_handle = kAvatarHandle;
    ++count;
    ++g.frame;
  }
  ++g.poll_count;
  *n = count;
  return kNoError;
}

// ---------------------------------------------------------------------------
// settings interface
// ---------------------------------------------------------------------------

static EMCPError CreateSettings(Handle* h) {
  g.settings_created = true;
  *h = kSettingsHandle;
  return kNoError;
}
static EMCPError DestroySettings(Handle h) {
  if (h != kSettingsHandle) return kInvalidHandle;
  g.settings_created = false;
  return kNoError;
}
static EMCPError SetSettingsUDP(uint16_t port, Handle h) {
  if (h != kSettingsHandle) return kInvalidHandle;
  g.udp_set = true;
  g.udp_port = port;
  return kNoError;
}
static EMCPError SetSettingsTCP(const char*, uint16_t, Handle) {
  return kNoError;
}
static EMCPError SetSettingsBvhRotation(int32_t order, Handle) {
  return (order >= 0 && order <= 5) ? kNoError : kInvalidParameter;
}
static EMCPError SetSettingsBvhTransformation(int32_t, Handle) {
  return kNoError;
}
static EMCPError SetSettingsBvhData(int32_t, Handle) { return kNoError; }
static EMCPError SetSettingsCalcData(Handle h) {
  if (h != kSettingsHandle) return kInvalidHandle;
  g.calc_data = true;
  return kNoError;
}
static EMCPError SetSettingsUDPServer(const char*, uint16_t, Handle) {
  return kNoError;
}

// ---------------------------------------------------------------------------
// sensor-module interface
// ---------------------------------------------------------------------------

static EMCPError GetSensorModulePosture(float* w, float* x, float* y,
                                        float* z, Handle h) {
  if (!is_sensor(h)) return kInvalidHandle;
  float q[4], a[3];
  sensor_signal(h, g.frame, q, a);
  *w = q[0]; *x = q[1]; *y = q[2]; *z = q[3];
  return kNoError;
}
static EMCPError GetSensorModuleAngularVelocity(float* x, float* y, float* z,
                                                Handle h) {
  if (!is_sensor(h)) return kInvalidHandle;
  *x = 0.f; *y = 0.f; *z = 0.05f * g.frame;
  return kNoError;
}
static EMCPError GetSensorModuleAcceleratedVelocity(float* x, float* y,
                                                    float* z, Handle h) {
  if (!is_sensor(h)) return kInvalidHandle;
  float q[4], a[3];
  sensor_signal(h, g.frame, q, a);
  *x = a[0]; *y = a[1]; *z = a[2];
  return kNoError;
}
static EMCPError GetSensorModuleId(uint32_t* id, Handle h) {
  if (!is_sensor(h)) return kInvalidHandle;
  *id = static_cast<uint32_t>(h - kSensorBase);
  return kNoError;
}
static EMCPError GetSensorModuleCompassValue(float* x, float* y, float* z,
                                             Handle h) {
  if (!is_sensor(h)) return kInvalidHandle;
  *x = 1.f; *y = 0.f; *z = 0.f;
  return kNoError;
}
static EMCPError GetSensorModuleTemperature(float* t, Handle h) {
  if (!is_sensor(h)) return kInvalidHandle;
  *t = 36.5f;
  return kNoError;
}

// ---------------------------------------------------------------------------
// avatar + joint + rigid-body interfaces
// ---------------------------------------------------------------------------

static EMCPError GetAvatarIndex(uint32_t* idx, Handle h) {
  if (h != kAvatarHandle) return kInvalidHandle;
  *idx = 0;
  return kNoError;
}
static EMCPError GetAvatarRootJoint(Handle* j, Handle h) {
  if (h != kAvatarHandle) return kInvalidHandle;
  *j = kJointHips;
  return kNoError;
}
static EMCPError GetAvatarJoints(Handle* out, uint32_t* n, Handle h) {
  if (h != kAvatarHandle) return kInvalidHandle;
  *n = 3;
  if (out) {
    out[0] = kJointHips;
    out[1] = kJointSpine;
    out[2] = kJointRightUpLeg;
  }
  return kNoError;
}
static EMCPError GetAvatarJointByName(const char* name, Handle* j, Handle) {
  if (std::strcmp(name, "Hips") == 0) { *j = kJointHips; return kNoError; }
  if (std::strcmp(name, "Spine") == 0) { *j = kJointSpine; return kNoError; }
  if (std::strcmp(name, "RightUpLeg") == 0) {
    *j = kJointRightUpLeg;
    return kNoError;
  }
  return 10;  // JointNotFound
}
static EMCPError GetAvatarName(const char** name, Handle h) {
  if (h != kAvatarHandle) return kInvalidHandle;
  *name = "MockAvatar";
  return kNoError;
}
static EMCPError GetAvatarRigidBodies(Handle*, uint32_t* n, Handle) {
  *n = 0;
  return kNoError;
}
static EMCPError GetAvatarJointHierarchy(const char** s) {
  *s = "Hips(Spine,RightUpLeg)";
  return kNoError;
}
static EMCPError GetAvatarPostureIndex(uint32_t* idx, Handle*) {
  *idx = static_cast<uint32_t>(g.frame);
  return kNoError;
}
static EMCPError GetAvatarPostureTimeCode(uint32_t* h, uint32_t* m,
                                          uint32_t* s, uint32_t* f,
                                          Handle*) {
  *h = 0; *m = 0; *s = g.frame / 60; *f = g.frame % 60;
  return kNoError;
}

static const char* joint_name(Handle h) {
  if (h == kJointHips) return "Hips";
  if (h == kJointSpine) return "Spine";
  if (h == kJointRightUpLeg) return "RightUpLeg";
  return nullptr;
}
static EMCPError GetJointName(const char** s, Handle h) {
  const char* n = joint_name(h);
  if (!n) return kInvalidHandle;
  *s = n;
  return kNoError;
}
static EMCPError GetJointLocalRotation(float* x, float* y, float* z,
                                       float* w, Handle h) {
  if (!joint_name(h)) return kInvalidHandle;
  float ang = 0.02f * g.frame + 0.1f * static_cast<float>(h - kJointHips);
  *w = std::cos(ang / 2); *x = 0.f; *y = std::sin(ang / 2); *z = 0.f;
  return kNoError;
}
static EMCPError GetJointLocalRotationByEuler(float* x, float* y, float* z,
                                              Handle h) {
  if (!joint_name(h)) return kInvalidHandle;
  *x = 0.f; *y = 0.02f * g.frame; *z = 0.f;
  return kNoError;
}
static EMCPError GetJointLocalPosition(float* x, float* y, float* z,
                                       Handle h) {
  if (!joint_name(h)) return kInvalidHandle;
  *x = 0.f; *y = (h == kJointHips) ? 0.9f : 0.1f; *z = 0.f;
  return kNoError;
}
static EMCPError GetJointDefaultLocalPosition(float* x, float* y, float* z,
                                              Handle h) {
  return GetJointLocalPosition(x, y, z, h);
}
static EMCPError GetJointChild(Handle* out, uint32_t* n, Handle h) {
  if (!joint_name(h)) return kInvalidHandle;
  if (h == kJointHips) {
    *n = 2;
    if (out) { out[0] = kJointSpine; out[1] = kJointRightUpLeg; }
  } else {
    *n = 0;
  }
  return kNoError;
}
static EMCPError GetJointBodyPart(Handle* bp, Handle) {
  *bp = 0;
  return kNoError;
}
static EMCPError GetJointSensorModule(Handle* sm, Handle h) {
  if (!joint_name(h)) return kInvalidHandle;
  *sm = kSensorBase + 1 + static_cast<int>(h - kJointHips) % kNumSensors;
  return kNoError;
}
static EMCPError GetJointTag(int32_t* tag, Handle h) {
  if (h == kJointHips) *tag = 0;           // Hips
  else if (h == kJointSpine) *tag = 7;     // Spine
  else if (h == kJointRightUpLeg) *tag = 1;
  else return kInvalidHandle;
  return kNoError;
}
static EMCPError GetJointNameByTag(const char** s, int32_t tag) {
  if (tag == 0) { *s = "Hips"; return kNoError; }
  if (tag == 7) { *s = "Spine"; return kNoError; }
  if (tag == 1) { *s = "RightUpLeg"; return kNoError; }
  return 10;
}
static EMCPError GetJointChildJointTag(int32_t* out, uint32_t* n,
                                       int32_t tag) {
  if (tag == 0) {
    *n = 2;
    if (out) { out[0] = 7; out[1] = 1; }
    return kNoError;
  }
  *n = 0;
  return kNoError;
}
static EMCPError GetJointParentJointTag(int32_t* out, int32_t tag) {
  *out = (tag == 0) ? -1 : 0;
  return kNoError;
}

static EMCPError GetRigidBodyRotation(float* x, float* y, float* z,
                                      float* w, Handle) {
  *w = 1.f; *x = *y = *z = 0.f;
  return kNoError;
}
static EMCPError GetRigidBodyPosition(float* x, float* y, float* z, Handle) {
  *x = *y = *z = 0.f;
  return kNoError;
}
static EMCPError GetRigidBodyStatus(int32_t* s, Handle) {
  *s = 1;
  return kNoError;
}
static EMCPError GetRigidBodyId(int32_t* id, Handle) {
  *id = 0;
  return kNoError;
}
static EMCPError GetRigidBodyJointTag(int32_t* t, Handle) {
  *t = 0;
  return kNoError;
}

// ---------------------------------------------------------------------------
// procedure tables + the generic-interface entry point
// ---------------------------------------------------------------------------

struct ApplicationTable {
  decltype(&CreateApplication) CreateApplication_;
  decltype(&DestroyApplication) DestroyApplication_;
  decltype(&SetApplicationSettings) SetApplicationSettings_;
  decltype(&SetApplicationRenderSettings) SetApplicationRenderSettings_;
  decltype(&OpenApplication) OpenApplication_;
  decltype(&EnableApplicationCacheEvents) EnableApplicationCacheEvents_;
  decltype(&DisableApplicationCacheEvents) DisableApplicationCacheEvents_;
  decltype(&ApplicationCacheEventsIsEnabled) ApplicationCacheEventsIsEnabled_;
  decltype(&CloseApplication) CloseApplication_;
  decltype(&GetApplicationRigidBodies) GetApplicationRigidBodies_;
  decltype(&GetApplicationAvatars) GetApplicationAvatars_;
  decltype(&PollApplicationNextEvent) PollApplicationNextEvent_;
  decltype(&GetApplicationSensorModules) GetApplicationSensorModules_;
};
static ApplicationTable g_app_table = {
    CreateApplication, DestroyApplication, SetApplicationSettings,
    SetApplicationRenderSettings, OpenApplication,
    EnableApplicationCacheEvents, DisableApplicationCacheEvents,
    ApplicationCacheEventsIsEnabled, CloseApplication,
    GetApplicationRigidBodies, GetApplicationAvatars,
    PollApplicationNextEvent, GetApplicationSensorModules};

struct SettingsTable {
  decltype(&CreateSettings) CreateSettings_;
  decltype(&DestroySettings) DestroySettings_;
  decltype(&SetSettingsUDP) SetSettingsUDP_;
  decltype(&SetSettingsTCP) SetSettingsTCP_;
  decltype(&SetSettingsBvhRotation) SetSettingsBvhRotation_;
  decltype(&SetSettingsBvhTransformation) SetSettingsBvhTransformation_;
  decltype(&SetSettingsBvhData) SetSettingsBvhData_;
  decltype(&SetSettingsCalcData) SetSettingsCalcData_;
  decltype(&SetSettingsUDPServer) SetSettingsUDPServer_;
};
static SettingsTable g_settings_table = {
    CreateSettings, DestroySettings, SetSettingsUDP, SetSettingsTCP,
    SetSettingsBvhRotation, SetSettingsBvhTransformation, SetSettingsBvhData,
    SetSettingsCalcData, SetSettingsUDPServer};

struct SensorModuleTable {
  decltype(&GetSensorModulePosture) GetSensorModulePosture_;
  decltype(&GetSensorModuleAngularVelocity) GetSensorModuleAngularVelocity_;
  decltype(&GetSensorModuleAcceleratedVelocity)
      GetSensorModuleAcceleratedVelocity_;
  decltype(&GetSensorModuleId) GetSensorModuleId_;
  decltype(&GetSensorModuleCompassValue) GetSensorModuleCompassValue_;
  decltype(&GetSensorModuleTemperature) GetSensorModuleTemperature_;
};
static SensorModuleTable g_sensor_table = {
    GetSensorModulePosture, GetSensorModuleAngularVelocity,
    GetSensorModuleAcceleratedVelocity, GetSensorModuleId,
    GetSensorModuleCompassValue, GetSensorModuleTemperature};

struct AvatarTable {
  decltype(&GetAvatarIndex) GetAvatarIndex_;
  decltype(&GetAvatarRootJoint) GetAvatarRootJoint_;
  decltype(&GetAvatarJoints) GetAvatarJoints_;
  decltype(&GetAvatarJointByName) GetAvatarJointByName_;
  decltype(&GetAvatarName) GetAvatarName_;
  decltype(&GetAvatarRigidBodies) GetAvatarRigidBodies_;
  decltype(&GetAvatarJointHierarchy) GetAvatarJointHierarchy_;
  decltype(&GetAvatarPostureIndex) GetAvatarPostureIndex_;
  decltype(&GetAvatarPostureTimeCode) GetAvatarPostureTimeCode_;
};
static AvatarTable g_avatar_table = {
    GetAvatarIndex, GetAvatarRootJoint, GetAvatarJoints,
    GetAvatarJointByName, GetAvatarName, GetAvatarRigidBodies,
    GetAvatarJointHierarchy, GetAvatarPostureIndex, GetAvatarPostureTimeCode};

struct JointTable {
  decltype(&GetJointName) GetJointName_;
  decltype(&GetJointLocalRotation) GetJointLocalRotation_;
  decltype(&GetJointLocalRotationByEuler) GetJointLocalRotationByEuler_;
  decltype(&GetJointLocalPosition) GetJointLocalPosition_;
  decltype(&GetJointDefaultLocalPosition) GetJointDefaultLocalPosition_;
  decltype(&GetJointChild) GetJointChild_;
  decltype(&GetJointBodyPart) GetJointBodyPart_;
  decltype(&GetJointSensorModule) GetJointSensorModule_;
  decltype(&GetJointTag) GetJointTag_;
  decltype(&GetJointNameByTag) GetJointNameByTag_;
  decltype(&GetJointChildJointTag) GetJointChildJointTag_;
  decltype(&GetJointParentJointTag) GetJointParentJointTag_;
};
static JointTable g_joint_table = {
    GetJointName, GetJointLocalRotation, GetJointLocalRotationByEuler,
    GetJointLocalPosition, GetJointDefaultLocalPosition, GetJointChild,
    GetJointBodyPart, GetJointSensorModule, GetJointTag, GetJointNameByTag,
    GetJointChildJointTag, GetJointParentJointTag};

struct RigidBodyTable {
  decltype(&GetRigidBodyRotation) GetRigidBodyRotation_;
  decltype(&GetRigidBodyPosition) GetRigidBodyPosition_;
  decltype(&GetRigidBodyStatus) GetRigidBodyStatus_;
  decltype(&GetRigidBodyId) GetRigidBodyId_;
  decltype(&GetRigidBodyJointTag) GetRigidBodyJointTag_;
};
static RigidBodyTable g_rigid_table = {
    GetRigidBodyRotation, GetRigidBodyPosition, GetRigidBodyStatus,
    GetRigidBodyId, GetRigidBodyJointTag};

extern "C" EMCPError MCPGetGenericInterface(const char* version,
                                            void** table) {
  if (!version || !table) return kInvalidParameter;
  if (std::strcmp(version, "PROC_TABLE:IMCPApplication_002") == 0)
    *table = &g_app_table;
  else if (std::strcmp(version, "PROC_TABLE:IMCPSettings_001") == 0)
    *table = &g_settings_table;
  else if (std::strcmp(version, "PROC_TABLE:IMCPSensorModule_001") == 0)
    *table = &g_sensor_table;
  else if (std::strcmp(version, "PROC_TABLE:IMCPAvatar_003") == 0)
    *table = &g_avatar_table;
  else if (std::strcmp(version, "PROC_TABLE:IMCPJoint_003") == 0)
    *table = &g_joint_table;
  else if (std::strcmp(version, "PROC_TABLE:IMCPRigidBody_001") == 0)
    *table = &g_rigid_table;
  else
    return 6;  // NotSupported
  return kNoError;
}
