/**
 * Minimal Arrow IPC *stream* decoder — dependency-free.
 *
 * The server's default query response is an Arrow IPC stream
 * (beacon_spark/server/http.py `_send_arrow_stream`; the reference
 * serves the same wire shape, beacon-server query.rs:23,36). The
 * reference SDK decodes it with the `apache-arrow` npm package; this
 * client targets environments with no package registry, so the IPC
 * framing, the flatbuffers metadata, and the column buffers are parsed
 * from the published format spec directly
 * (arrow/format/Message.fbs, Schema.fbs — public Apache Arrow spec).
 *
 * Scope: the column types the engine emits over HTTP — ints (8..64,
 * signed/unsigned), float32/64, utf8/large_utf8, bool, timestamp (all
 * units, tz or not), date32/64, decimal128, binary, null. Nested types
 * and dictionary encoding raise a loud error. Compressed bodies raise
 * too — ask the server for an uncompressed stream with the
 * `x-beacon-ipc-compression: none` request header.
 */

const TEXT = new TextDecoder();

// ---------------------------------------------------------------- flatbuffers

/** Cursor over one flatbuffers message (little-endian throughout). */
class FB {
  /** @param {Uint8Array} bytes */
  constructor(bytes) {
    this.b = bytes;
    this.dv = new DataView(bytes.buffer, bytes.byteOffset, bytes.byteLength);
  }

  i8(p) { return this.dv.getInt8(p); }
  u8(p) { return this.dv.getUint8(p); }
  i16(p) { return this.dv.getInt16(p, true); }
  i32(p) { return this.dv.getInt32(p, true); }
  u32(p) { return this.dv.getUint32(p, true); }
  i64(p) { return this.dv.getBigInt64(p, true); }
  f32(p) { return this.dv.getFloat32(p, true); }
  f64(p) { return this.dv.getFloat64(p, true); }

  /** Root table position. */
  root() { return this.u32(0); }

  /**
   * Absolute position of table field `id`'s data, or -1 when absent.
   * @param {number} table table position
   * @param {number} id field id
   */
  field(table, id) {
    const vtable = table - this.i32(table);
    const vsize = this.i16(vtable);
    const voff = 4 + 2 * id;
    if (voff >= vsize) return -1;
    const rel = this.i16(vtable + voff);
    return rel === 0 ? -1 : table + rel;
  }

  /** Table-typed field: follow the uoffset. */
  table(table, id) {
    const p = this.field(table, id);
    return p < 0 ? -1 : p + this.u32(p);
  }

  /** String field → JS string ("" when absent). */
  string(table, id) {
    const p = this.field(table, id);
    if (p < 0) return "";
    const s = p + this.u32(p);
    const n = this.u32(s);
    return TEXT.decode(this.b.subarray(s + 4, s + 4 + n));
  }

  /** Vector field → {pos of element 0, length} or null. */
  vector(table, id) {
    const p = this.field(table, id);
    if (p < 0) return null;
    const v = p + this.u32(p);
    return { pos: v + 4, length: this.u32(v) };
  }

  /** Scalar field with a default. */
  scalar(table, id, read, dflt) {
    const p = this.field(table, id);
    return p < 0 ? dflt : read.call(this, p);
  }
}

// ------------------------------------------------------------------ schema

/** Type union member ids (Schema.fbs `union Type`, NONE = 0). */
const T = {
  Null: 1, Int: 2, FloatingPoint: 3, Binary: 4, Utf8: 5, Bool: 6,
  Decimal: 7, Date: 8, Time: 9, Timestamp: 10, List: 12, Struct: 13,
  LargeBinary: 19, LargeUtf8: 20,
};

const TS_UNITS = ["second", "millisecond", "microsecond", "nanosecond"];

/**
 * @param {FB} fb
 * @param {number} fieldPos Field table position
 */
function decodeField(fb, fieldPos) {
  const name = fb.string(fieldPos, 0);
  const nullable = fb.scalar(fieldPos, 1, fb.i8, 0) !== 0;
  const typeType = fb.scalar(fieldPos, 2, fb.u8, 0);
  const tpos = fb.table(fieldPos, 3);
  if (fb.field(fieldPos, 4) >= 0) {
    throw new Error(`arrow: dictionary-encoded field "${name}" unsupported`);
  }
  /** @type {any} */
  let type;
  switch (typeType) {
    case T.Null: type = { kind: "null" }; break;
    case T.Int:
      type = {
        kind: "int",
        bitWidth: fb.scalar(tpos, 0, fb.i32, 0),
        signed: fb.scalar(tpos, 1, fb.i8, 0) !== 0,
      };
      break;
    case T.FloatingPoint:
      type = { kind: "float", precision: fb.scalar(tpos, 0, fb.i16, 0) };
      break;
    case T.Utf8:
    case T.LargeUtf8:
      type = { kind: "utf8", large: typeType === T.LargeUtf8 };
      break;
    case T.Binary:
    case T.LargeBinary:
      type = { kind: "binary", large: typeType === T.LargeBinary };
      break;
    case T.Bool: type = { kind: "bool" }; break;
    case T.Decimal:
      type = {
        kind: "decimal",
        precision: fb.scalar(tpos, 0, fb.i32, 0),
        scale: fb.scalar(tpos, 1, fb.i32, 0),
        bitWidth: fb.scalar(tpos, 2, fb.i32, 128),
      };
      break;
    case T.Date:
      // Schema.fbs: Date.unit DEFAULT = MILLISECOND (1) — a date64
      // writer omits the field, so defaulting to 0 (DAY) mis-decoded
      // every date64 column; date32 writers spell unit=0 explicitly
      type = { kind: "date", unit: fb.scalar(tpos, 0, fb.i16, 1) };
      break;
    case T.Timestamp:
      type = {
        kind: "timestamp",
        unit: TS_UNITS[fb.scalar(tpos, 0, fb.i16, 0)],
        timezone: fb.string(tpos, 1) || null,
      };
      break;
    case T.Time:
      type = {
        kind: "time",
        unit: TS_UNITS[fb.scalar(tpos, 0, fb.i16, 1)],
        bitWidth: fb.scalar(tpos, 1, fb.i32, 32),
      };
      break;
    default:
      throw new Error(`arrow: unsupported type id ${typeType} for column "${name}"`);
  }
  return { name, nullable, type };
}

/** @param {FB} fb @param {number} schemaPos */
function decodeSchema(fb, schemaPos) {
  const vec = fb.vector(schemaPos, 1);
  const fields = [];
  if (vec) {
    for (let i = 0; i < vec.length; i++) {
      const fpos = vec.pos + 4 * i + fb.u32(vec.pos + 4 * i);
      fields.push(decodeField(fb, fpos));
    }
  }
  return { fields };
}

// ------------------------------------------------------------- record batch

/** Bit `i` of a validity bitmap. */
function validAt(bytes, i) {
  return (bytes[i >> 3] & (1 << (i & 7))) !== 0;
}

const SAFE = 2n ** 53n;

/** BigInt → Number when exact, else BigInt. */
function looseBigInt(v) {
  return v >= -SAFE && v <= SAFE ? Number(v) : v;
}

/**
 * Decode one column's values from its buffers.
 * @param {{name: string, type: any}} field
 * @param {{length: number, nullCount: number}} node
 * @param {Uint8Array[]} bufs the field's buffers in layout order
 * @returns {any[]}
 */
function decodeColumn(field, node, bufs) {
  const { type } = field;
  const n = node.length;
  // bound the allocation by what the buffers can actually hold: a
  // corrupt length field otherwise makes `new Array(n)` allocate
  // gigabytes before any bounds-checked read ever throws (heap OOM
  // kills the tab/process instead of surfacing a decode error)
  if (!Number.isSafeInteger(n) || n < 0) {
    throw new Error(`arrow: invalid field node length ${n}`);
  }
  const need =
    type.kind === "null" ? 0
    : (type.kind === "utf8" || type.kind === "binary")
      ? (type.large ? 8 : 4) * (n + 1)              // offsets buffer
    : type.kind === "bool" ? Math.ceil(n / 8)
    : type.kind === "int" ? (type.bitWidth / 8) * n
    : type.kind === "float" ? (type.precision === 2 ? 8 : 4) * n
    : type.kind === "decimal" ? 16 * n
    : type.kind === "date" ? (type.unit === 0 ? 4 : 8) * n
    : type.kind === "timestamp" ? 8 * n
    : type.kind === "time" ? (type.bitWidth === 64 ? 8 : 4) * n
    : 0;
  if (need > 0 && (bufs[1]?.length ?? 0) < need) {
    throw new Error(
      `arrow: field ${JSON.stringify(field.name)} declares ${n} values ` +
      `but its buffer holds ${bufs[1]?.length ?? 0} bytes (< ${need})`);
  }
  const validity = bufs[0];
  const isValid = node.nullCount > 0 && validity.length > 0
    ? (i) => validAt(validity, i)
    : () => true;
  const out = new Array(n);

  if (type.kind === "null") {
    out.fill(null);
    return out;
  }
  const data = bufs[1];
  const dv = new DataView(data.buffer, data.byteOffset, data.byteLength);

  if (type.kind === "utf8" || type.kind === "binary") {
    const offsets = bufs[1];
    const values = bufs[2];
    const odv = new DataView(offsets.buffer, offsets.byteOffset, offsets.byteLength);
    const at = type.large
      ? (i) => Number(odv.getBigInt64(8 * i, true))
      : (i) => odv.getInt32(4 * i, true);
    for (let i = 0; i < n; i++) {
      if (!isValid(i)) { out[i] = null; continue; }
      const a = at(i), b = at(i + 1);
      out[i] = type.kind === "utf8"
        ? TEXT.decode(values.subarray(a, b))
        : values.slice(a, b);
    }
    return out;
  }

  /** @type {(i: number) => any} */
  let get;
  if (type.kind === "bool") {
    get = (i) => validAt(data, i);
  } else if (type.kind === "int") {
    const w = type.bitWidth;
    if (w === 64) {
      get = type.signed
        ? (i) => looseBigInt(dv.getBigInt64(8 * i, true))
        : (i) => looseBigInt(dv.getBigUint64(8 * i, true));
    } else {
      const readers = {
        8: type.signed ? dv.getInt8.bind(dv) : dv.getUint8.bind(dv),
        16: (i) => (type.signed ? dv.getInt16(i, true) : dv.getUint16(i, true)),
        32: (i) => (type.signed ? dv.getInt32(i, true) : dv.getUint32(i, true)),
      };
      const r = readers[w];
      const bytes = w / 8;
      get = (i) => r(bytes * i);
    }
  } else if (type.kind === "float") {
    // precision: 0=half 1=single 2=double
    if (type.precision === 2) get = (i) => dv.getFloat64(8 * i, true);
    else if (type.precision === 1) get = (i) => dv.getFloat32(4 * i, true);
    else throw new Error("arrow: float16 unsupported");
  } else if (type.kind === "timestamp") {
    // epoch in the stream's unit → JS Date (ms); sub-ms truncates
    const toMs = {
      second: (v) => Number(v) * 1000,
      millisecond: (v) => Number(v),
      microsecond: (v) => Number(v / 1000n),
      nanosecond: (v) => Number(v / 1000000n),
    }[type.unit];
    get = (i) => new Date(toMs(dv.getBigInt64(8 * i, true)));
  } else if (type.kind === "date") {
    get = type.unit === 0
      ? (i) => new Date(dv.getInt32(4 * i, true) * 86_400_000)
      : (i) => new Date(Number(dv.getBigInt64(8 * i, true)));
  } else if (type.kind === "decimal") {
    if (type.bitWidth !== 128) throw new Error("arrow: only decimal128 supported");
    if (type.scale < 0 || type.scale > 76) {
      // decimal128 holds at most 38 digits; a corrupt scale field would
      // otherwise make `10n ** scale` compute an astronomically large
      // BigInt (multi-second stall per value)
      throw new Error(`arrow: invalid decimal scale ${type.scale}`);
    }
    const scale = BigInt(type.scale);
    get = (i) => {
      const lo = dv.getBigUint64(16 * i, true);
      const hi = dv.getBigInt64(16 * i + 8, true);
      const v = (hi << 64n) | lo;
      if (scale === 0n) return looseBigInt(v);
      const base = 10n ** scale;
      const whole = v / base;
      const frac = v % base;
      return Number(whole) + Number(frac) / Number(base);
    };
  } else if (type.kind === "time") {
    get = type.bitWidth === 64
      ? (i) => looseBigInt(dv.getBigInt64(8 * i, true))
      : (i) => dv.getInt32(4 * i, true);
  } else {
    throw new Error(`arrow: unsupported column kind ${type.kind}`);
  }

  for (let i = 0; i < n; i++) out[i] = isValid(i) ? get(i) : null;
  return out;
}

/**
 * @param {FB} fb
 * @param {number} rbPos RecordBatch table position
 * @param {Uint8Array} body
 * @param {{fields: any[]}} schema
 */
function decodeRecordBatch(fb, rbPos, body, schema) {
  if (fb.field(rbPos, 3) >= 0) {
    throw new Error(
      "arrow: compressed IPC body — request an uncompressed stream " +
      "(x-beacon-ipc-compression: none)"
    );
  }
  const nodesVec = fb.vector(rbPos, 1);
  const bufsVec = fb.vector(rbPos, 2);
  const nodes = [];
  for (let i = 0; i < (nodesVec?.length ?? 0); i++) {
    const p = nodesVec.pos + 16 * i; // struct FieldNode {long length; long null_count}
    nodes.push({ length: Number(fb.i64(p)), nullCount: Number(fb.i64(p + 8)) });
  }
  const buffers = [];
  for (let i = 0; i < (bufsVec?.length ?? 0); i++) {
    const p = bufsVec.pos + 16 * i; // struct Buffer {long offset; long length}
    const off = Number(fb.i64(p));
    const len = Number(fb.i64(p + 8));
    buffers.push(body.subarray(off, off + len));
  }
  const nRows = Number(fb.scalar(rbPos, 0, fb.i64, 0n));
  if (!Number.isSafeInteger(nRows) || nRows < 0) {
    throw new Error(`arrow: invalid record batch length ${nRows}`);
  }

  const BUFFERS_PER_KIND = (t) =>
    t.kind === "null" ? 0 : (t.kind === "utf8" || t.kind === "binary") ? 3 : 2;

  /** @type {Record<string, any[]>} */
  const columns = {};
  let ni = 0, bi = 0;
  for (const field of schema.fields) {
    const node = nodes[ni++];
    const take = BUFFERS_PER_KIND(field.type);
    const bufs = buffers.slice(bi, bi + take);
    bi += take;
    if (Object.prototype.hasOwnProperty.call(columns, field.name)) {
      // columns are keyed by name: a duplicate (SELECT 1 AS x, 2 AS x)
      // would silently overwrite the earlier column's values — refuse
      throw new Error(
        `arrow: duplicate column name ${JSON.stringify(field.name)} in ` +
        "result — alias the columns distinctly"
      );
    }
    if (node.length !== nRows) {
      // top-level columns of a flat schema carry exactly the batch's
      // row count; a mismatch is corruption (and an unchecked huge
      // node.length is an allocation bomb for null columns)
      throw new Error(
        `arrow: field ${JSON.stringify(field.name)} node length ` +
        `${node.length} != batch length ${nRows}`);
    }
    columns[field.name] = field.type.kind === "null"
      ? new Array(node.length).fill(null)
      : decodeColumn(field, node, bufs);
  }
  return { numRows: nRows, columns };
}

// --------------------------------------------------------------- streaming

/** MessageHeader union ids. */
const MSG = { Schema: 1, DictionaryBatch: 2, RecordBatch: 3 };

/**
 * Incremental IPC-stream parser: feed bytes, pull complete messages.
 * Handles both the continuation-marker framing (0xFFFFFFFF + i32 len)
 * and the legacy bare-length framing; a zero length is end-of-stream.
 */
export class ArrowStreamParser {
  constructor() {
    /** @type {Uint8Array[]} */
    this._chunks = [];
    this._size = 0;
    this._eos = false;
    this.schema = null;
  }

  /** @param {Uint8Array} bytes */
  push(bytes) {
    if (bytes.length) {
      this._chunks.push(bytes);
      this._size += bytes.length;
    }
  }

  _buf() {
    if (this._chunks.length === 1) return this._chunks[0];
    const all = new Uint8Array(this._size);
    let o = 0;
    for (const c of this._chunks) { all.set(c, o); o += c.length; }
    this._chunks = [all];
    return all;
  }

  _consume(n) {
    const all = this._buf();
    this._chunks = [all.subarray(n)];
    this._size -= n;
  }

  /**
   * Decode every complete batch currently buffered.
   * @returns {{numRows: number, columns: Record<string, any[]>}[]}
   */
  drain() {
    const out = [];
    for (;;) {
      if (this._eos || this._size < 8) return out;
      const all = this._buf();
      const dv = new DataView(all.buffer, all.byteOffset, all.byteLength);
      let metaLen, headerBytes;
      if (dv.getUint32(0, true) === 0xffffffff) {
        metaLen = dv.getInt32(4, true);
        headerBytes = 8;
      } else {
        metaLen = dv.getInt32(0, true); // legacy framing
        headerBytes = 4;
      }
      if (metaLen === 0) { this._eos = true; return out; }
      if (this._size < headerBytes + metaLen) return out;
      const fb = new FB(all.subarray(headerBytes, headerBytes + metaLen));
      const msg = fb.root();
      const headerType = fb.scalar(msg, 1, fb.u8, 0);
      const bodyLength = Number(fb.scalar(msg, 3, fb.i64, 0n));
      if (this._size < headerBytes + metaLen + bodyLength) return out;
      const body = all.subarray(headerBytes + metaLen, headerBytes + metaLen + bodyLength);
      const headerPos = fb.table(msg, 2);
      if (headerType === MSG.Schema) {
        this.schema = decodeSchema(fb, headerPos);
      } else if (headerType === MSG.RecordBatch) {
        if (!this.schema) throw new Error("arrow: record batch before schema");
        out.push(decodeRecordBatch(fb, headerPos, body, this.schema));
      } else if (headerType === MSG.DictionaryBatch) {
        throw new Error("arrow: dictionary batches unsupported");
      }
      this._consume(headerBytes + metaLen + bodyLength);
    }
  }
}

/**
 * Decode a whole IPC stream held in memory.
 * @param {Uint8Array} bytes
 * @returns {{schema: any, numRows: number, columns: Record<string, any[]>,
 *            batches: {numRows: number, columns: Record<string, any[]>}[]}}
 */
export function tableFromIPC(bytes) {
  const p = new ArrowStreamParser();
  p.push(bytes);
  const batches = p.drain();
  if (!p.schema) throw new Error("arrow: no schema message in stream");
  /** @type {Record<string, any[]>} */
  const columns = {};
  for (const f of p.schema.fields) {
    if (Object.prototype.hasOwnProperty.call(columns, f.name)) {
      // also guard the zero-batch path (schema-only stream)
      throw new Error(
        `arrow: duplicate column name ${JSON.stringify(f.name)} in ` +
        "result — alias the columns distinctly"
      );
    }
    columns[f.name] = [];
  }
  let numRows = 0;
  for (const b of batches) {
    numRows += b.numRows;
    for (const f of p.schema.fields) {
      const col = b.columns[f.name];
      for (let i = 0; i < col.length; i++) columns[f.name].push(col[i]);
    }
  }
  return { schema: p.schema, numRows, columns, batches };
}

/**
 * Rows-of-objects view of a decoded table or batch.
 * @param {{schema?: any, numRows: number, columns: Record<string, any[]>}} table
 * @returns {Record<string, any>[]}
 */
export function rowsFromTable(table) {
  const names = Object.keys(table.columns);
  const rows = new Array(table.numRows);
  for (let i = 0; i < table.numRows; i++) {
    /** @type {Record<string, any>} */
    const r = {};
    for (const n of names) r[n] = table.columns[n][i];
    rows[i] = r;
  }
  return rows;
}

/**
 * Async-iterate record batches out of a fetch Response body.
 * @param {Response} res
 * @returns {AsyncGenerator<{numRows: number, columns: Record<string, any[]>, schema: any}>}
 */
export async function* batchesFromResponse(res) {
  const parser = new ArrowStreamParser();
  const reader = res.body.getReader();
  for (;;) {
    const { done, value } = await reader.read();
    if (value) parser.push(value);
    for (const b of parser.drain()) yield { ...b, schema: parser.schema };
    if (done) return;
  }
}
