"""Generated protobuf stubs (see serving.proto; regenerate via native/build.sh)."""
