/** Type declarations for @ucfp/client (see ucfp.mjs). */

export interface Fingerprint {
  tenantId: number;
  recordId: number;
  modality: string;
  algorithm: string;
  formatVersion: number;
  configHash: string;
  fingerprintBytes: number;
  fingerprintHex: string;
  hasEmbedding: boolean;
  embedding?: number[];
}
export type TextFingerprint = Fingerprint;
export type ImageFingerprint = Fingerprint;
export type AudioFingerprint = Fingerprint;

export interface RecordMeta {
  tenantId: number;
  recordId: number;
  modality: string;
  algorithm: string;
  configHash: string;
  formatVersion: number;
  fingerprintBytes: number;
  hasEmbedding: boolean;
  embeddingDim?: number;
  modelId?: string | null;
  fingerprintHex?: string;
  embedding?: number[];
}

export interface WatermarkReport {
  detected: boolean;
  payload?: number | null;
  confidence: number;
}

export interface TermHit {
  term: string;
  idf?: number;
  tf?: number;
  contribution?: number;
}

export interface Hit {
  tenantId: number;
  recordId: number;
  score: number;
  source: string;
  vectorScore?: number;
  bm25Score?: number;
  vectorRank?: number;
  bm25Rank?: number;
  termHits: TermHit[];
}

export interface QueryResult {
  hits: Hit[];
  approximate: boolean;
}

export interface Canonicalizer {
  normalization?: 'nfc' | 'nfkc' | 'nfd' | 'nfkd' | 'none';
  caseFold?: boolean;
  stripBidi?: boolean;
  stripFormat?: boolean;
  applyConfusable?: boolean;
}

export interface TextOptions {
  algorithm?: string;
  h?: number;
  k?: number;
  tokenizer?: string;
  canonicalizer?: Canonicalizer;
  preprocess?: 'html' | 'markdown' | 'pdf';
  recordId?: number;
  tenantId?: number;
  returnEmbedding?: boolean;
}

export interface ImageOptions {
  algorithm?: string;
  preprocess?: {
    maxInputBytes?: number;
    maxDimension?: number;
    minDimension?: number;
  };
  recordId?: number;
  tenantId?: number;
}

export interface AudioOptions {
  algorithm?: string;
  sampleRate: number;
  recordId?: number;
  tenantId?: number;
  tunables?: Record<string, number | string>;
}

export interface QueryOptions {
  k?: number;
  vector?: number[];
  terms?: string[];
  fingerprintHex?: string;
  algorithm?: string;
  rrfK?: number;
  explain?: boolean;
  multihash?: Record<string, number>;
  filter?: { algorithm?: string; modelId?: never; model_id?: string };
  recallTier?: 'fast' | 'balanced' | 'high' | 'exact';
  tenantId?: number;
}

export interface ClientOptions {
  apiKey?: string;
  baseUrl?: string;
  tenantId?: number;
  fetch?: typeof fetch;
  timeoutMs?: number;
  retry?: { attempts?: number; base?: number };
}

export declare class UcfpError extends Error {
  status: number;
  code: string;
  retryAfterMs?: number;
  recordId?: number;
  constructor(
    status: number,
    code: string,
    message: string,
    retryAfterMs?: number,
    recordId?: number
  );
}

export declare class UcfpClient {
  constructor(opts?: ClientOptions);
  healthz(): Promise<Record<string, unknown>>;
  info(): Promise<Record<string, unknown>>;
  algorithms(): Promise<Record<string, unknown>>;
  text(text: string, opts?: TextOptions): Promise<TextFingerprint>;
  textStream(
    inputs: Iterable<string> | AsyncIterable<string>,
    opts?: TextOptions
  ): AsyncGenerator<TextFingerprint>;
  image(
    image: Blob | ArrayBuffer | Uint8Array,
    opts?: ImageOptions
  ): Promise<ImageFingerprint>;
  audio(
    samples: Float32Array | ArrayBuffer | Uint8Array,
    opts: AudioOptions
  ): Promise<AudioFingerprint>;
  audioWatermark(
    samples: Float32Array | ArrayBuffer | Uint8Array,
    opts: { sampleRate: number; threshold?: number; tenantId?: number }
  ): Promise<WatermarkReport>;
  getRecord(
    recordId: number,
    opts?: { tenantId?: number; include?: string }
  ): Promise<RecordMeta>;
  deleteRecord(recordId: number, opts?: { tenantId?: number }): Promise<void>;
  query(modality: string, opts?: QueryOptions): Promise<QueryResult>;
  textBatch(
    docs: [number, string][],
    opts?: { algorithm?: string; tenantId?: number }
  ): Promise<{
    records: Record<string, unknown>[];
    errors: Record<string, unknown>[];
  }>;
  imageBatch(
    images: [number, Uint8Array][],
    opts?: { algorithm?: string; tenantId?: number }
  ): Promise<Record<string, unknown>[]>;
  audioBatch(
    clips: [number, Float32Array | Int16Array | Uint8Array][],
    opts: {
      sampleRate: number;
      algorithm?: string;
      tenantId?: number;
      tunables?: Record<string, number | boolean>;
      /** 's16' halves the wire bytes for 16-bit-sourced clips
       *  (Int16Array / raw s16-LE bytes); value-identical server-side. */
      encoding?: 'f32' | 's16';
    }
  ): Promise<Record<string, unknown>[]>;
  embeddingBatch(
    rows: [number, Float32Array | number[]][],
    opts?: {
      algorithm?: string;
      modelId?: string;
      modality?: string;
      configHash?: number;
      tenantId?: number;
    }
  ): Promise<{ count: number; dim: number; algorithm: string }>;
  queryBatch(
    modality: string,
    opts?: BatchQueryOptions
  ): Promise<BatchQueryResult>;
}

export interface BatchQueryOptions {
  k?: number;
  vectors?: number[][];
  fingerprintsHex?: string[];
  algorithm?: string;
  multihash?: Record<string, number>;
  tenantId?: number;
  filter?: { algorithm?: string; model_id?: string };
  recallTier?: 'fast' | 'balanced' | 'high' | 'exact';
}

export interface BatchQueryResult {
  results: { hits: Hit[] }[];
  approximate: boolean;
}

export default UcfpClient;
