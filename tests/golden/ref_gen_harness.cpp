// Golden harness: drives the REFERENCE generator (compiled from
// /root/reference/src/generator_ETHZ.cu — plain CPU C++, no device code)
// to dump byte streams that tests/test_generator_parity.py compares
// byte-for-byte against our native generator (datagen/native/
// host_engine.cpp). This file contains only driver plumbing; all generator
// logic under test lives in the reference translation unit.
//
// Usage:
//   ref_gen uniform <out.bin> <n> <maxid> <seed>
//   ref_gen unique  <out.bin> <n> <maxid> <seed48>
//   ref_gen fk      <out.bin> <n_fk> <pk.bin> <n_pk> <seed>
//   ref_gen zipf    <out.bin> <n> <alphabet> <z> <seed>
//
// "unique" note: reference random_unique_gen seeds its nrand48 state from
// time(NULL) (generator_ETHZ.cu:134-135), so the harness reproduces its
// deterministic part exactly: the same cycle fill (0,1..maxid,1,2..maxid,..)
// followed by the reference's own knuth_shuffle48 with an explicit seed —
// matching our tj_random_unique_gen(seed48) contract (the one documented
// deviation: explicit seed instead of wall-clock).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

#include "generator_ETHZ.cuh"

static void dump(const char* path, const int* buf, uint64_t n) {
  FILE* f = fopen(path, "wb");
  if (!f) { perror("fopen"); exit(2); }
  fwrite(buf, sizeof(int), n, f);
  fclose(f);
}

int main(int argc, char** argv) {
  if (argc < 3) { fprintf(stderr, "bad args\n"); return 2; }
  const char* mode = argv[1];
  const char* out_path = argv[2];

  if (!strcmp(mode, "uniform")) {
    uint64_t n = strtoull(argv[3], nullptr, 10);
    int64_t maxid = strtoll(argv[4], nullptr, 10);
    unsigned int seed = (unsigned int)strtoul(argv[5], nullptr, 10);
    std::vector<int> buf(n);
    seed_generator(seed);
    random_gen(buf.data(), n, maxid);
    dump(out_path, buf.data(), n);
  } else if (!strcmp(mode, "unique")) {
    uint64_t n = strtoull(argv[3], nullptr, 10);
    int64_t maxid = strtoll(argv[4], nullptr, 10);
    unsigned int seed48 = (unsigned int)strtoul(argv[5], nullptr, 10);
    std::vector<int> buf(n);
    // the reference fill rule (random_unique_gen, generator_ETHZ.cu:137-145)
    int64_t firstkey = 0;
    for (uint64_t i = 0; i < n; i++) {
      buf[i] = (int)firstkey;
      if (firstkey == maxid) firstkey = 0;
      firstkey++;
    }
    unsigned short state[3] = {0, 0, 0};
    memcpy(state, &seed48, sizeof(seed48));
    knuth_shuffle48(buf.data(), n, state);
    dump(out_path, buf.data(), n);
  } else if (!strcmp(mode, "fk")) {
    uint64_t n_fk = strtoull(argv[3], nullptr, 10);
    const char* pk_path = argv[4];
    uint64_t n_pk = strtoull(argv[5], nullptr, 10);
    unsigned int seed = (unsigned int)strtoul(argv[6], nullptr, 10);
    std::vector<int> pk(n_pk), fk(n_fk);
    FILE* f = fopen(pk_path, "rb");
    if (!f || fread(pk.data(), sizeof(int), n_pk, f) != n_pk) return 2;
    fclose(f);
    seed_generator(seed);
    // nonexistent cache filename => create_relation_fk_from_pk generates
    // (tile + knuth_shuffle) and writes the cache; we dump our own copy.
    char tmpname[4096];
    snprintf(tmpname, sizeof(tmpname), "%s.refcache", out_path);
    remove(tmpname);
    create_relation_fk_from_pk(tmpname, fk.data(), n_fk, pk.data(), n_pk);
    remove(tmpname);
    dump(out_path, fk.data(), n_fk);
  } else if (!strcmp(mode, "zipf")) {
    uint64_t n = strtoull(argv[3], nullptr, 10);
    unsigned int alphabet = (unsigned int)strtoul(argv[4], nullptr, 10);
    double z = strtod(argv[5], nullptr);
    unsigned int seed = (unsigned int)strtoul(argv[6], nullptr, 10);
    std::vector<int> buf(n);
    seed_generator(seed);
    gen_zipf(n, alphabet, z, buf.data());
    dump(out_path, buf.data(), n);
  } else {
    fprintf(stderr, "unknown mode %s\n", mode);
    return 2;
  }
  return 0;
}
