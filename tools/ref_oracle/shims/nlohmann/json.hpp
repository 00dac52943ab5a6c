#pragma once
// nlohmann/json 3.11.3 (MIT, vendored from this image's tensorflow
// includes) + a 3.10-style diagnostics(const&) compat overload the
// reference CLI needs. See json_vendored.hpp header for license.
#include "json_vendored.hpp"
