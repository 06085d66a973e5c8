#pragma once  // boost shim: unused by the I/NAV encoder harness
