/* C ABI for the zerokit-tpu RLN engine.
 *
 * Native-equivalent of the reference's safer-ffi C surface
 * (rln/src/ffi/ffi_rln.rs, ffi_rln_v3.rs, ffi_tree.rs; header rln.h generated
 * via the `headers` feature). The engine itself runs the TPU/JAX pipeline;
 * this library embeds the runtime and exposes the same byte-level wire
 * formats (protocol/serialize: v2 LE/BE witness codecs, V3 proof layout =
 * 128-byte LE Groth16 proof + proof values).
 *
 * Conventions:
 *   - all functions returning int give 0 on success, -1 on error;
 *     rln_last_error() describes the most recent error on this thread.
 *   - rln_buffer results are malloc'd; release with rln_buffer_free.
 *   - field elements are 32-byte little-endian unless a `be` flag says
 *     otherwise (utils.rs fr_to_bytes_le/be semantics).
 */

#ifndef ZEROKIT_TPU_RLN_H
#define ZEROKIT_TPU_RLN_H

#include <stddef.h>
#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef struct rln_buffer {
  uint8_t *ptr;
  size_t len;
} rln_buffer;

void rln_buffer_free(rln_buffer *buf);

/* Most recent error message for this thread ("" if none). */
const char *rln_last_error(void);

/* ---- lifecycle (ffi_rln.rs new/free; ffi_rln_v3.rs:324-506 ctors) ---- */

/* Initialize the embedded runtime explicitly (optional; first call does it).
 * Returns 0 on success. */
int rln_init(void);

/* Create an engine. mode: "single" | "multi". tree_backend (stateful only):
 * "full" | "optimal" | "pmtree". zkey/graph may be NULL to use the embedded
 * depth-20 resources (circuit/mod.rs:29-82 equivalents). tree_config_json
 * may be NULL; for "pmtree" it takes the reference's PmTreeConfig JSON
 * (pm_tree_adapter.rs:139-174). Returns a handle > 0, or 0 on error. */
uint64_t rln_new(int stateful, const char *mode, const char *tree_backend,
                 const uint8_t *zkey, size_t zkey_len, const uint8_t *graph,
                 size_t graph_len, const char *tree_config_json);

void rln_free(uint64_t handle);

/* ---- tree ops (ffi_tree.rs:21-258) ---- */

int rln_set_leaf(uint64_t handle, uint64_t index, const uint8_t fr_le[32]);
int rln_get_leaf(uint64_t handle, uint64_t index, rln_buffer *out);
/* leaves: length-prefixed vec<Fr> wire bytes (utils.rs vec_fr codecs). */
int rln_set_leaves_from(uint64_t handle, uint64_t index, const uint8_t *leaves,
                        size_t leaves_len);
int rln_init_tree_with_leaves(uint64_t handle, const uint8_t *leaves,
                              size_t leaves_len);
int rln_atomic_operation(uint64_t handle, uint64_t index,
                         const uint8_t *leaves, size_t leaves_len,
                         const uint64_t *indices, size_t n_indices);
int rln_set_next_leaf(uint64_t handle, const uint8_t fr_le[32]);
int rln_delete_leaf(uint64_t handle, uint64_t index);
int rln_get_root(uint64_t handle, rln_buffer *out);
int rln_get_subtree_root(uint64_t handle, uint64_t level, uint64_t index,
                         rln_buffer *out);
/* vec<Fr> path elements + vec<u8> path index, LE. */
int rln_get_merkle_proof(uint64_t handle, uint64_t index, rln_buffer *out);
/* out = little-endian u64 indices, 8 bytes each. */
int rln_get_empty_leaves_indices(uint64_t handle, rln_buffer *out);
int64_t rln_leaves_set(uint64_t handle);
int rln_tree_depth(uint64_t handle);
int rln_set_metadata(uint64_t handle, const uint8_t *data, size_t len);
int rln_get_metadata(uint64_t handle, rln_buffer *out);
int rln_flush(uint64_t handle);

/* ---- proof ops (ffi_rln.rs prove/verify; ffi_rln_v3.rs:507-1605) ---- */

/* witness: v2 wire bytes (LE when be=0); out: V3 proof wire bytes. */
int rln_generate_proof(uint64_t handle, const uint8_t *witness,
                       size_t witness_len, int be, rln_buffer *out);
/* Proves from an externally-computed witness vector (the browser/wasm flow;
   reference public.rs generate_rln_proof_with_witness). `calculated` is
   n_wires concatenated 32-byte little-endian field elements; `witness` is
   the witness-input wire bytes used for the public values. */
int rln_prove_with_witness(uint64_t handle, const uint8_t *calculated,
                           size_t calculated_len, const uint8_t *witness,
                           size_t witness_len, int be, rln_buffer *out);
/* Groth16 pairing check only. *ok = 1 valid / 0 invalid. */
int rln_verify(uint64_t handle, const uint8_t *proof, size_t proof_len,
               int *ok);
/* Pairing + current-root + signal checks (public.rs:725-745). */
int rln_verify_rln_proof(uint64_t handle, const uint8_t *proof,
                         size_t proof_len, const uint8_t x_le[32], int *ok);
/* roots: vec<Fr> wire bytes, may be NULL/empty (public.rs:937-954 order). */
int rln_verify_with_roots(uint64_t handle, const uint8_t *proof,
                          size_t proof_len, const uint8_t x_le[32],
                          const uint8_t *roots, size_t roots_len, int *ok);
int rln_generate_partial_proof(uint64_t handle, const uint8_t *partial_witness,
                               size_t len, int be, rln_buffer *out);
int rln_finish_proof(uint64_t handle, const uint8_t *partial_proof,
                     size_t partial_len, const uint8_t *witness,
                     size_t witness_len, int be, rln_buffer *out);
/* Two V3 proof byte strings sharing an external nullifier -> 32-byte secret
 * (slashing.rs:43-100). Error if the proofs don't slash. */
int rln_recover_id_secret(const uint8_t *proof1, size_t len1,
                          const uint8_t *proof2, size_t len2, rln_buffer *out);

/* ---- primitives (ffi_rln.rs keygen/hash exports) ---- */

/* out = 32-byte secret || 32-byte commitment (LE). */
int rln_keygen(rln_buffer *out);
int rln_seeded_keygen(const uint8_t *seed, size_t seed_len, rln_buffer *out);
/* out = trapdoor || nullifier || secret || commitment (4 x 32 bytes). */
int rln_extended_keygen(rln_buffer *out);
int rln_extended_seeded_keygen(const uint8_t *seed, size_t seed_len,
                               rln_buffer *out);
/* Keccak256 hash-to-field (hashers.rs:66-93). */
int rln_hash_to_field(const uint8_t *signal, size_t len, int be,
                      rln_buffer *out);
/* inputs: vec<Fr> wire bytes; Poseidon arity picked from length. */
int rln_poseidon_hash(const uint8_t *inputs, size_t inputs_len,
                      rln_buffer *out);


/* ---- standalone codecs (ffi_rln.rs *_to_bytes_{le,be} exports): each
 * parses (validating canonicality / full consumption) and re-serializes. */
int rln_recode_witness(const uint8_t *data, size_t len, int in_be, int out_be,
                       rln_buffer *out);
int rln_recode_partial_witness(const uint8_t *data, size_t len, int in_be,
                               int out_be, rln_buffer *out);
int rln_recode_proof_values(const uint8_t *data, size_t len, int in_be,
                            int out_be, rln_buffer *out);
/* v2 witness wire <-> V3 witness wire (serialize.rs:248-674 layouts). */
int rln_witness_to_v3(const uint8_t *data, size_t len, int in_be, int out_be,
                      rln_buffer *out);
int rln_v3_to_witness(const uint8_t *data, size_t len, int in_be, int out_be,
                      rln_buffer *out);
/* Witness wire -> recomputed proof-values wire (witness.rs:759-828). */
int rln_proof_values_from_witness(const uint8_t *witness, size_t len, int be,
                                  rln_buffer *out);
/* V3 proof wire -> its proof-values wire (no pairing check). */
int rln_extract_proof_values(const uint8_t *proof, size_t len, int be,
                             rln_buffer *out);
/* Proof-values field accessors (reference ffi_utils.rs CFr accessors). */
int rln_proof_values_root(const uint8_t *values, size_t len, int be,
                          rln_buffer *out);
int rln_proof_values_x(const uint8_t *values, size_t len, int be,
                       rln_buffer *out);
int rln_proof_values_external_nullifier(const uint8_t *values, size_t len,
                                        int be, rln_buffer *out);
/* Active nullifiers as vec<Fr> wire bytes (Single: one entry). */
int rln_proof_values_nullifiers(const uint8_t *values, size_t len, int be,
                                rln_buffer *out);

/* ---- vec builder helpers (ffi_utils.rs Vec<CFr>/Vec<u8> builders) ---- */

/* n concatenated 32-byte field elements -> length-prefixed vec<Fr> wire. */
int rln_vec_fr_build(const uint8_t *frs, size_t len, int be, rln_buffer *out);
int rln_vec_fr_len(const uint8_t *vec, size_t len, int be, size_t *count);
int rln_vec_fr_get(const uint8_t *vec, size_t len, int be, size_t index,
                   rln_buffer *out);
int rln_vec_u8_build(const uint8_t *data, size_t len, int be, rln_buffer *out);
int rln_vec_u8_read(const uint8_t *vec, size_t len, int be, rln_buffer *out);

/* ---- BE keygen variants + extra hashers (ffi_rln.rs exports) ---- */

int rln_keygen_be(rln_buffer *out);
int rln_seeded_keygen_be(const uint8_t *seed, size_t seed_len, rln_buffer *out);
int rln_extended_keygen_be(rln_buffer *out);
int rln_extended_seeded_keygen_be(const uint8_t *seed, size_t seed_len,
                                  rln_buffer *out);
int rln_poseidon_hash_pair(const uint8_t a[32], const uint8_t b[32], int be,
                           rln_buffer *out);
/* Identity secret -> Poseidon commitment (keygen.rs:16-30 relation). */
int rln_id_commitment(const uint8_t secret[32], int be, rln_buffer *out);

/* ---- extended engine ops ---- */

/* Ctor reading the tree config from a file, 1 MB cap (ffi_rln_v3.rs:18). */
uint64_t rln_new_with_config_file(int stateful, const char *mode,
                                  const char *tree_backend, const uint8_t *zkey,
                                  size_t zkey_len, const uint8_t *graph,
                                  size_t graph_len, const char *config_path);
/* All set leaves [0, leaves_set) as vec<Fr> wire bytes. */
int rln_get_leaves(uint64_t handle, rln_buffer *out);
/* Deterministic proving with caller blinding (proof.rs:753 _with_rs). */
int rln_generate_proof_with_rs(uint64_t handle, const uint8_t *witness,
                               size_t witness_len, int be, const uint8_t r[32],
                               const uint8_t s[32], rln_buffer *out);
/* Batch-first proving: `count` concatenated witness wires in, `count`
 * concatenated V3 proof wires out (one device pipeline pass). */
int rln_generate_proofs(uint64_t handle, size_t count, const uint8_t *witnesses,
                        size_t witnesses_len, int be, rln_buffer *out);

/* ---- component-wise witness construction + per-field accessors ----------
 * (reference ffi_rln_v3.rs:507-1605 ergonomics: C callers build and inspect
 * witnesses field-by-field instead of hand-rolling the wire layout).
 * path_elements / message_ids: vec<Fr> wire bytes (rln_vec_fr_build);
 * path_index / selectors: vec<u8> wire bytes (rln_vec_u8_build). */
int rln_witness_build_single(const uint8_t secret[32], uint64_t limit,
                             uint64_t message_id, const uint8_t *path_elements,
                             size_t path_elements_len,
                             const uint8_t *path_index, size_t path_index_len,
                             const uint8_t x[32],
                             const uint8_t external_nullifier[32], int be,
                             rln_buffer *out);
int rln_witness_build_multi(const uint8_t secret[32], uint64_t limit,
                            const uint8_t *message_ids, size_t message_ids_len,
                            const uint8_t *selectors, size_t selectors_len,
                            const uint8_t *path_elements,
                            size_t path_elements_len, const uint8_t *path_index,
                            size_t path_index_len, const uint8_t x[32],
                            const uint8_t external_nullifier[32], int be,
                            rln_buffer *out);
/* Per-field getters over witness wire bytes; scalars as one 32-byte Fr,
 * vectors as vec<Fr>/vec<u8> wire bytes. */
int rln_witness_identity_secret(const uint8_t *witness, size_t len, int be,
                                rln_buffer *out);
int rln_witness_user_message_limit(const uint8_t *witness, size_t len, int be,
                                   rln_buffer *out);
int rln_witness_message_ids(const uint8_t *witness, size_t len, int be,
                            rln_buffer *out);
int rln_witness_x(const uint8_t *witness, size_t len, int be, rln_buffer *out);
int rln_witness_external_nullifier(const uint8_t *witness, size_t len, int be,
                                   rln_buffer *out);
int rln_witness_path_elements(const uint8_t *witness, size_t len, int be,
                              rln_buffer *out);
int rln_witness_path_index(const uint8_t *witness, size_t len, int be,
                           rln_buffer *out);
/* Active y share(s) / selector flags from proof-values wire bytes. */
int rln_proof_values_ys(const uint8_t *values, size_t len, int be,
                        rln_buffer *out);
int rln_proof_values_selectors(const uint8_t *values, size_t len, int be,
                               rln_buffer *out);

/* ---- Fr field helpers (reference ffi_utils.rs CFr arithmetic) ----------
 * 32-byte field elements (LE when be = 0); out is always 32 bytes. */
int rln_fr_add(const uint8_t a[32], const uint8_t b[32], int be,
               rln_buffer *out);
int rln_fr_sub(const uint8_t a[32], const uint8_t b[32], int be,
               rln_buffer *out);
int rln_fr_mul(const uint8_t a[32], const uint8_t b[32], int be,
               rln_buffer *out);
/* Division by zero is an error (nonzero rc + rln_last_error). */
int rln_fr_div(const uint8_t a[32], const uint8_t b[32], int be,
               rln_buffer *out);
int rln_fr_neg(const uint8_t a[32], int be, rln_buffer *out);
int rln_fr_inv(const uint8_t a[32], int be, rln_buffer *out);
int rln_fr_from_uint64(uint64_t v, int be, rln_buffer *out);
/* Uniform random Fr (rejection-sampled, ark Fr::rand semantics). */
int rln_fr_random(int be, rln_buffer *out);

#ifdef __cplusplus
} /* extern "C" */
#endif

#endif /* ZEROKIT_TPU_RLN_H */
