// Endpoint-pack oracle (test-only tooling; never part of the runtime).
//
// Feeds arbitrary endpoint-pack requests through the REFERENCE encoder's
// pack_color_endpoints (Source/astcenc_color_quantize.cpp:1909-2147) so the
// TPU port (astcenc_tpu/ops/color_pack.py, color_pack_hdr.py) can be
// golden-tested bit-exactly per format x quant level.
//
// Build (after tools/build_ref_dump.sh's refbuild exists):
//   g++ -O2 -march=native -std=c++17 -ffp-contract=off -pthread \
//       -I /root/reference/Source tools/pack_oracle.cpp \
//       /tmp/refbuild/Source/libastcenc-native-static.a -o /tmp/pack_oracle
//
// Protocol: binary records on stdin, binary records on stdout.
//   in : float c0[4], c1[4], rgbs[4], rgbo[4]; u8 format; u8 quant_level
//        (50 bytes per record, packed)
//   out: u8 retval(actual format); u8 output[8]  (9 bytes per record)
// Runs until EOF.

#include <cstdint>
#include <cstdio>
#include <cstring>

#include "astcenc_internal.h"

struct InRec
{
	float c0[4];
	float c1[4];
	float rgbs[4];
	float rgbo[4];
	uint8_t format;
	uint8_t quant;
};

int main()
{
	uint8_t buf[66];
	const size_t insz = 16 * 4 + 2;
	while (fread(buf, 1, insz, stdin) == insz)
	{
		InRec r;
		memcpy(r.c0, buf, 16);
		memcpy(r.c1, buf + 16, 16);
		memcpy(r.rgbs, buf + 32, 16);
		memcpy(r.rgbo, buf + 48, 16);
		r.format = buf[64];
		r.quant = buf[65];

		vfloat4 c0(r.c0[0], r.c0[1], r.c0[2], r.c0[3]);
		vfloat4 c1(r.c1[0], r.c1[1], r.c1[2], r.c1[3]);
		vfloat4 rgbs(r.rgbs[0], r.rgbs[1], r.rgbs[2], r.rgbs[3]);
		vfloat4 rgbo(r.rgbo[0], r.rgbo[1], r.rgbo[2], r.rgbo[3]);

		uint8_t out[8] = {0, 0, 0, 0, 0, 0, 0, 0};
		uint8_t ret = pack_color_endpoints(
		    c0, c1, rgbs, rgbo, r.format, out,
		    static_cast<quant_method>(r.quant));

		uint8_t orec[9];
		orec[0] = ret;
		memcpy(orec + 1, out, 8);
		fwrite(orec, 1, 9, stdout);
	}
	fflush(stdout);
	return 0;
}
