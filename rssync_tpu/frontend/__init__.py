"""Host/device front-end: telemetry ingest, gyro integration, feature
tracking, lens profiles (ref: rust/telemetry-parser-cpp/,
src/core_testcode.cpp)."""
