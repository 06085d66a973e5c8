// Minimal UHD shim: the reference's structures.h only names these types
// in struct fields the I/NAV encoder harness never touches.  The real
// multi_usrp.hpp also transitively provides the std headers structures.h
// relies on -- replicate that here.
#pragma once
#include <map>
#include <memory>
#include <string>
#include <cmath>
using std::floor;
#include <vector>
namespace uhd {
struct tx_metadata_t {};
struct tx_streamer { typedef std::shared_ptr<void> sptr; };
}
