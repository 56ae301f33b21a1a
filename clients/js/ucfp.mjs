/**
 * @ucfp/client — dependency-free JavaScript client for the UCFP
 * content-fingerprinting API.
 *
 * Surface per the reference doc (web/src/lib/docs/sdk-javascript.md):
 * UcfpClient with text/textStream/image/audio/audioWatermark/
 * getRecord/deleteRecord plus query(), typed UcfpError, configurable
 * fetch/timeout/retry. Works in Node >= 18, Bun, Deno, and browsers.
 */

export class UcfpError extends Error {
  /**
   * @param {number} status HTTP status
   * @param {string} code machine error code (the {error} envelope field)
   * @param {string} message human message
   * @param {number|undefined} retryAfterMs from Retry-After on 429
   * @param {number|undefined} recordId record the failing call named
   */
  constructor(status, code, message, retryAfterMs, recordId) {
    super(`${status} ${code}: ${message}`);
    this.name = 'UcfpError';
    this.status = status;
    this.code = code;
    this.message = message;
    this.retryAfterMs = retryAfterMs;
    this.recordId = recordId;
  }
}

const sleep = (ms) => new Promise((r) => setTimeout(r, ms));

/** Random u53 record id (ids are u64 server-side; 53 bits keeps JS
 * number round-trips exact — pass BigInt/string ids yourself if you
 * need the full range). No bitwise ops: they would coerce to int32. */
const newRecordId = () =>
  Math.floor(Math.random() * Number.MAX_SAFE_INTEGER) + 1;

const CANON_PARAMS = {
  normalization: 'canon_normalization',
  caseFold: 'canon_case_fold',
  stripBidi: 'canon_strip_bidi',
  stripFormat: 'canon_strip_format',
  applyConfusable: 'canon_apply_confusable',
};

function canonParams(canonicalizer, params) {
  if (!canonicalizer) return;
  for (const [key, value] of Object.entries(canonicalizer)) {
    const name = CANON_PARAMS[key];
    if (!name) throw new Error(`unknown canonicalizer knob ${key}`);
    params.set(name, typeof value === 'boolean' ? (value ? '1' : '0')
      : String(value).toLowerCase());
  }
}

function fingerprintOf(body) {
  return {
    tenantId: body.tenant_id,
    recordId: body.record_id,
    modality: body.modality,
    algorithm: body.algorithm,
    formatVersion: body.format_version,
    configHash: String(body.config_hash),
    fingerprintBytes: body.fingerprint_bytes,
    fingerprintHex: body.fingerprint_hex,
    hasEmbedding: body.has_embedding,
    embedding: body.embedding,
  };
}

function hitOf(h) {
  return {
    tenantId: h.tenant_id,
    recordId: h.record_id,
    score: h.score,
    source: h.source,
    vectorScore: h.vector_score,
    bm25Score: h.bm25_score,
    vectorRank: h.vector_rank,
    bm25Rank: h.bm25_rank,
    termHits: (h.term_hits ?? []).map((t) => ({
      term: t.term, idf: t.idf, tf: t.tf, contribution: t.contribution,
    })),
  };
}

export class UcfpClient {
  /**
   * @param {{apiKey?: string, baseUrl?: string, tenantId?: number,
   *          fetch?: typeof fetch, timeoutMs?: number,
   *          retry?: {attempts?: number, base?: number}}} opts
   */
  constructor(opts = {}) {
    this.apiKey = opts.apiKey;
    this.baseUrl = (opts.baseUrl ?? 'http://127.0.0.1:8080').replace(/\/+$/, '');
    this.tenantId = opts.tenantId ?? 0;
    this.fetch = opts.fetch ?? globalThis.fetch;
    this.timeoutMs = opts.timeoutMs ?? 30_000;
    this.retry = { attempts: 3, base: 250, ...(opts.retry ?? {}) };
  }

  async #request(method, path, { params, body, json, recordId, extraHeaders } = {}) {
    const url = new URL(this.baseUrl + path);
    if (params) {
      for (const [k, v] of Object.entries(params)) {
        if (v !== undefined && v !== null) url.searchParams.set(k, String(v));
      }
    }
    const headers = { ...(extraHeaders || {}) };
    if (this.apiKey) headers.authorization = `Bearer ${this.apiKey}`;
    let payload = body;
    if (json !== undefined) {
      headers['content-type'] = 'application/json';
      payload = JSON.stringify(json);
    }
    for (let attempt = 0; ; attempt++) {
      const ctl = new AbortController();
      const timer = setTimeout(() => ctl.abort(), this.timeoutMs);
      let resp;
      try {
        resp = await this.fetch(url, {
          method, headers, body: payload, signal: ctl.signal,
        });
      } finally {
        clearTimeout(timer);
      }
      if (resp.ok) {
        const text = await resp.text();
        return text ? JSON.parse(text) : {};
      }
      let code = 'error';
      let message = '';
      try {
        const parsed = await resp.json();
        code = parsed.error ?? code;
        message = parsed.message ?? '';
      } catch { /* non-JSON error body */ }
      const ra = resp.headers.get('retry-after');
      const retryAfterMs = ra ? Math.round(parseFloat(ra) * 1000) : undefined;
      const err = new UcfpError(resp.status, code, message, retryAfterMs, recordId);
      const retryable = resp.status === 429 || resp.status >= 500;
      if (retryable && attempt < this.retry.attempts) {
        await sleep(retryAfterMs ?? this.retry.base * 2 ** attempt);
        continue;
      }
      throw err;
    }
  }

  // -- public ---------------------------------------------------------------

  healthz() { return this.#request('GET', '/healthz'); }
  info() { return this.#request('GET', '/v1/info'); }
  algorithms() { return this.#request('GET', '/v1/algorithms'); }

  // -- text -----------------------------------------------------------------

  /**
   * @param {string} text
   * @param {{algorithm?: string, h?: number, k?: number, tokenizer?: string,
   *          canonicalizer?: object, preprocess?: string, recordId?: number,
   *          tenantId?: number, returnEmbedding?: boolean}} opts
   */
  async text(text, opts = {}) {
    const tid = opts.tenantId ?? this.tenantId;
    const rid = opts.recordId ?? newRecordId();
    const params = new URLSearchParams({ algorithm: opts.algorithm ?? 'minhash' });
    if (opts.h !== undefined) params.set('h', String(opts.h));
    if (opts.k !== undefined) params.set('k', String(opts.k));
    if (opts.tokenizer) params.set('tokenizer', opts.tokenizer.toLowerCase());
    if (opts.preprocess) params.set('preprocess', opts.preprocess);
    if (opts.returnEmbedding) params.set('return_embedding', '1');
    canonParams(opts.canonicalizer, params);
    const out = await this.#request('POST',
      `/v1/ingest/text/${tid}/${rid}?${params}`,
      { body: text, recordId: rid });
    return fingerprintOf(out);
  }

  /** Fingerprint each input of a (sync or async) iterable lazily. */
  async *textStream(inputs, opts = {}) {
    for await (const doc of inputs) yield this.text(doc, opts);
  }

  // -- image ----------------------------------------------------------------

  /**
   * @param {Blob|ArrayBuffer|Uint8Array} image
   * @param {{algorithm?: string, preprocess?: {maxInputBytes?: number,
   *          maxDimension?: number, minDimension?: number},
   *          recordId?: number, tenantId?: number}} opts
   */
  async image(image, opts = {}) {
    const tid = opts.tenantId ?? this.tenantId;
    const rid = opts.recordId ?? newRecordId();
    const params = new URLSearchParams({ algorithm: opts.algorithm ?? 'multi' });
    const pre = opts.preprocess ?? {};
    if (pre.maxInputBytes !== undefined) params.set('max_input_bytes', String(pre.maxInputBytes));
    if (pre.maxDimension !== undefined) params.set('max_dimension', String(pre.maxDimension));
    if (pre.minDimension !== undefined) params.set('min_dimension', String(pre.minDimension));
    const out = await this.#request('POST',
      `/v1/ingest/image/${tid}/${rid}?${params}`,
      { body: image, recordId: rid });
    return fingerprintOf(out);
  }

  /** High-throughput batch ingest (<=1024 images, one device batch +
   *  one WAL group commit server-side). images = [[recordId,
   *  Uint8Array], ...]. Returns the per-image record list. */
  async imageBatch(images, opts = {}) {
    if (!images.length) return [];
    if (images.length > 1024) throw new Error('batch exceeds 1024 images');
    const tid = opts.tenantId ?? this.tenantId;
    const params = new URLSearchParams({ algorithm: opts.algorithm ?? 'multi' });
    let total = 0;
    for (const [, img] of images) total += 12 + img.byteLength;
    const body = new Uint8Array(total);
    const dv = new DataView(body.buffer);
    let off = 0;
    for (const [rid, img] of images) {
      dv.setBigUint64(off, BigInt(rid), true);
      dv.setUint32(off + 8, img.byteLength, true);
      body.set(img, off + 12);
      off += 12 + img.byteLength;
    }
    const out = await this.#request('POST',
      `/v1/ingest/image/batch/${tid}?${params}`, { body });
    return out.records;
  }

  /** High-throughput batch audio ingest (<=256 clips, one shared
   *  sampleRate; equal-length clips ride one vmapped device dispatch
   *  per stage server-side, one WAL commit). clips = [[recordId,
   *  Float32Array-or-Uint8Array-f32le], ...]; algorithm
   *  wang|panako|haitsma. encoding:'s16' halves the wire bytes for
   *  16-bit-sourced clips (pass Int16Array or raw s16-LE bytes per
   *  clip; exactly value-identical server-side — float clips are
   *  refused rather than silently quantized). Returns the per-clip
   *  record list. */
  async audioBatch(clips, opts = {}) {
    if (!clips.length) return [];
    if (clips.length > 256) throw new Error('batch exceeds 256 clips');
    if (!opts.sampleRate) throw new Error('sampleRate is required');
    const tid = opts.tenantId ?? this.tenantId;
    const enc = opts.encoding ?? 'f32';
    const params = new URLSearchParams({
      sample_rate: String(opts.sampleRate),
      algorithm: opts.algorithm ?? 'wang',
    });
    if (enc !== 'f32') params.set('encoding', enc);
    for (const [k, v] of Object.entries(opts.tunables ?? {})) {
      params.set(k, String(v));
    }
    const raw = clips.map(([rid, clip]) => {
      if (enc === 's16') {
        if (clip instanceof Float32Array) {
          throw new Error("encoding 's16' requires Int16Array or raw "
            + "s16-LE bytes (converting floats would quantize)");
        }
        return [rid, clip instanceof Int16Array
          ? new Uint8Array(clip.buffer, clip.byteOffset, clip.byteLength)
          : clip];
      }
      if (clip instanceof Int16Array) {
        // mirror of the s16 branch's Float32Array refusal: i16 bytes
        // under the f32 encoding would be decoded server-side as
        // garbage floats (and only 400 when not 4-aligned)
        throw new Error("encoding 'f32' (the default) requires "
          + "Float32Array or raw f32-LE bytes; pass encoding:'s16' "
          + "for Int16Array clips");
      }
      return [rid, clip instanceof Float32Array
        ? new Uint8Array(clip.buffer, clip.byteOffset, clip.byteLength)
        : clip];
    });
    let total = 0;
    for (const [, pcm] of raw) total += 12 + pcm.byteLength;
    const body = new Uint8Array(total);
    const dv = new DataView(body.buffer);
    let off = 0;
    for (const [rid, pcm] of raw) {
      dv.setBigUint64(off, BigInt(rid), true);
      dv.setUint32(off + 8, pcm.byteLength, true);
      body.set(pcm, off + 12);
      off += 12 + pcm.byteLength;
    }
    const out = await this.#request('POST',
      `/v1/ingest/audio/batch/${tid}?${params}`, { body });
    return out.records;
  }

  /** High-throughput bulk load of pre-computed embeddings (<=4096
   *  rows, one WAL run commit server-side; binary f32 frames — no
   *  JSON float parsing on the path). rows = [[recordId,
   *  Float32Array-or-number[]], ...], every row the same dim; values
   *  are stored as f32 and each row's fingerprint is its f32-LE
   *  bytes. Returns {count, dim, algorithm}. */
  async embeddingBatch(rows, opts = {}) {
    if (!rows.length) return { count: 0, dim: 0, algorithm: opts.algorithm ?? 'embedding-local' };
    if (rows.length > 4096) throw new Error('batch exceeds 4096 rows');
    const tid = opts.tenantId ?? this.tenantId;
    const params = new URLSearchParams({
      algorithm: opts.algorithm ?? 'embedding-local',
      modality: opts.modality ?? 'text',
    });
    if (opts.modelId) params.set('model_id', opts.modelId);
    if (opts.configHash) params.set('config_hash', String(opts.configHash));
    const raw = rows.map(([rid, vec]) => [
      rid,
      vec instanceof Float32Array ? vec : Float32Array.from(vec),
    ]);
    let total = 0;
    for (const [, vec] of raw) total += 12 + vec.byteLength;
    const body = new Uint8Array(total);
    const dv = new DataView(body.buffer);
    let off = 0;
    for (const [rid, vec] of raw) {
      dv.setBigUint64(off, BigInt(rid), true);
      dv.setUint32(off + 8, vec.byteLength, true);
      body.set(new Uint8Array(vec.buffer, vec.byteOffset, vec.byteLength), off + 12);
      off += 12 + vec.byteLength;
    }
    const out = await this.#request('POST',
      `/v1/ingest/embedding/batch/${tid}?${params}`, { body });
    return out;
  }

  /**
   * Batch text ingest: one WAL commit per request (up to 1024 docs).
   * docs = [[recordId, text], ...]. Returns BOTH the durably committed
   * records and the per-line failures — partial success commits the
   * valid remainder, so throwing would discard the committed list. An
   * all-rows-failed batch (400) rejects with UcfpError as usual.
   * @param {[number, string][]} docs
   * @param {{algorithm?: string, tenantId?: number}} opts
   * @returns {Promise<{records: object[], errors: object[]}>}
   */
  async textBatch(docs, opts = {}) {
    if (!docs.length) return { records: [], errors: [] };
    if (docs.length > 1024) throw new Error('batch exceeds 1024 documents');
    const tid = opts.tenantId ?? this.tenantId;
    const params = new URLSearchParams({ algorithm: opts.algorithm ?? 'minhash' });
    const body = docs
      .map(([rid, text]) => JSON.stringify({ record_id: rid, text }) + '\n')
      .join('');
    const out = await this.#request('POST',
      `/v1/ingest/text/batch/${tid}?${params}`,
      { body, extraHeaders: { 'content-type': 'application/x-ndjson' } });
    return { records: out.records ?? [], errors: out.errors ?? [] };
  }

  // -- audio ----------------------------------------------------------------

  /**
   * Raw f32-LE PCM samples. In the browser, decode first with WebAudio
   * (AudioContext.decodeAudioData → Float32Array), as the reference demo
   * does.
   * @param {Float32Array|ArrayBuffer|Uint8Array} samples
   * @param {{algorithm?: string, sampleRate: number, recordId?: number,
   *          tenantId?: number, tunables?: object}} opts
   */
  async audio(samples, opts) {
    if (!opts?.sampleRate) throw new Error('sampleRate is required');
    const tid = opts.tenantId ?? this.tenantId;
    const rid = opts.recordId ?? newRecordId();
    const params = new URLSearchParams({
      algorithm: opts.algorithm ?? 'wang',
      sample_rate: String(opts.sampleRate),
    });
    for (const [k, v] of Object.entries(opts.tunables ?? {})) params.set(k, String(v));
    const body = samples instanceof Float32Array
      ? new Uint8Array(samples.buffer, samples.byteOffset, samples.byteLength)
      : samples;
    const out = await this.#request('POST',
      `/v1/ingest/audio/${tid}/${rid}?${params}`,
      { body, recordId: rid });
    return fingerprintOf(out);
  }

  /** Watermark detection — no record persisted. `opts.key` is the
   *  per-tenant embedding secret (sent as X-Watermark-Key, never in
   *  the URL). */
  async audioWatermark(samples, opts) {
    if (!opts?.sampleRate) throw new Error('sampleRate is required');
    if (!opts?.key) throw new Error('key is required (per-tenant watermark secret)');
    const tid = opts.tenantId ?? this.tenantId;
    const rid = newRecordId();
    const params = new URLSearchParams({ sample_rate: String(opts.sampleRate) });
    if (opts.threshold !== undefined) params.set('threshold', String(opts.threshold));
    const body = samples instanceof Float32Array
      ? new Uint8Array(samples.buffer, samples.byteOffset, samples.byteLength)
      : samples;
    const out = await this.#request('POST',
      `/v1/ingest/audio/${tid}/${rid}/watermark?${params}`,
      { body, extraHeaders: { 'x-watermark-key': opts.key } });
    return { detected: out.detected, payload: out.payload, confidence: out.confidence };
  }

  // -- records --------------------------------------------------------------

  async getRecord(recordId, opts = {}) {
    const tid = opts.tenantId ?? this.tenantId;
    const qs = opts.include ? `?include=${encodeURIComponent(opts.include)}` : '';
    const m = await this.#request('GET', `/v1/records/${tid}/${recordId}${qs}`,
      { recordId });
    return {
      tenantId: m.tenant_id,
      recordId: m.record_id,
      modality: m.modality,
      algorithm: m.algorithm,
      configHash: String(m.config_hash),
      formatVersion: m.format_version,
      fingerprintBytes: m.fingerprint_bytes,
      hasEmbedding: m.has_embedding,
      embeddingDim: m.embedding_dim,
      modelId: m.model_id,
      fingerprintHex: m.fingerprint_hex,
      embedding: m.embedding,
    };
  }

  async deleteRecord(recordId, opts = {}) {
    const tid = opts.tenantId ?? this.tenantId;
    await this.#request('DELETE', `/v1/records/${tid}/${recordId}`, { recordId });
  }

  // -- search ---------------------------------------------------------------

  /**
   * @param {string} modality 'text' | 'image' | 'audio'
   * @param {{k?: number, vector?: number[], terms?: string[],
   *          fingerprintHex?: string, algorithm?: string, rrfK?: number,
   *          explain?: boolean, multihash?: object, tenantId?: number,
   *          recallTier?: 'fast'|'balanced'|'high'|'exact'}} opts
   */
  async query(modality, opts = {}) {
    const tid = opts.tenantId ?? this.tenantId;
    const body = { tenant_id: tid, modality, k: opts.k ?? 10 };
    if (opts.vector) body.vector = opts.vector;
    if (opts.terms?.length) body.terms = opts.terms;
    if (opts.fingerprintHex) {
      if (!opts.algorithm) throw new Error('fingerprint queries require algorithm');
      body.fingerprint_hex = opts.fingerprintHex;
    }
    if (opts.algorithm) body.algorithm = opts.algorithm;
    if (opts.rrfK !== undefined) body.rrf_k = opts.rrfK;
    if (opts.multihash) body.multihash = opts.multihash;
    if (opts.filter) body.filter = opts.filter;
    if (opts.recallTier) body.recall_tier = opts.recallTier;
    const path = opts.explain ? '/v1/query?explain=1' : '/v1/query';
    const out = await this.#request('POST', path, { json: body });
    return {
      hits: (out.hits ?? []).map(hitOf),
      approximate: out.approximate ?? false,
    };
  }

  /**
   * Batched similarity query: every vector (or fingerprint) shares ONE
   * device dispatch on the server — the highest-throughput query path
   * (at most 256 per batch). Pass exactly one of vectors / fingerprintsHex
   * (the latter requires algorithm; friendly ids like 'phash' work).
   *
   * @param {string} modality 'text' | 'image' | 'audio'
   * @param {{k?: number, vectors?: number[][], fingerprintsHex?: string[],
   *          algorithm?: string, multihash?: object, tenantId?: number,
   *          filter?: object,
   *          recallTier?: 'fast'|'balanced'|'high'|'exact'}} opts
   * @returns {Promise<{results: {hits: object[]}[], approximate: boolean}>}
   */
  async queryBatch(modality, opts = {}) {
    const tid = opts.tenantId ?? this.tenantId;
    if (!!opts.vectors === !!opts.fingerprintsHex) {
      throw new Error('pass exactly one of vectors or fingerprintsHex');
    }
    const body = { tenant_id: tid, modality, k: opts.k ?? 10 };
    if (opts.vectors) body.vectors = opts.vectors;
    if (opts.fingerprintsHex) {
      if (!opts.algorithm) throw new Error('fingerprint queries require algorithm');
      body.fingerprints_hex = opts.fingerprintsHex;
    }
    if (opts.algorithm) body.algorithm = opts.algorithm;
    if (opts.multihash) body.multihash = opts.multihash;
    if (opts.filter) body.filter = opts.filter;
    if (opts.recallTier) body.recall_tier = opts.recallTier;
    const out = await this.#request('POST', '/v1/query', { json: body });
    return {
      results: (out.results ?? []).map((r) => ({
        hits: (r.hits ?? []).map(hitOf),
      })),
      approximate: out.approximate ?? false,
    };
  }
}

export default UcfpClient;
