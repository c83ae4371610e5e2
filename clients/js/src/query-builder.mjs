/**
 * Fluent builder producing the engine's JSON query DSL — the same
 * builder surface as the reference SDK
 * (beacon-clients/beacon-ts/src/query-builder.ts): predicates chain
 * (`col("depth").gte(0)`), the query shape mirrors
 * `from(...).where(...).orderBy(...).take(...)`.
 *
 * Example — recent warm surface casts from a parquet dataset, newest
 * first, keeping the two measured columns:
 *
 * ```js
 * const { rows } = await client
 *   .from({ parquet: { paths: ["casts/2026/*.parquet"] } })
 *   .select(column("sea_temp", "t"), "pressure_dbar")
 *   .where((c) => c.pressure_dbar.lt(10).and(c.sea_temp.gt(18)))
 *   .orderByDescending("cast_time")
 *   .take(25)
 *   .execute();
 * ```
 */

// -- filter expressions ---------------------------------------------------

/** A composable filter expression. Combine with `.and()` / `.or()`. */
export class FilterNode {
  /** @param {object} filter */
  constructor(filter) {
    this.filter = filter;
  }

  /** @param {...FilterNode} others */
  and(...others) {
    return new FilterNode({ and: [this.filter, ...others.map((o) => o.filter)] });
  }

  /** @param {...FilterNode} others */
  or(...others) {
    return new FilterNode({ or: [this.filter, ...others.map((o) => o.filter)] });
  }

  /** The underlying DSL filter object. */
  build() {
    return this.filter;
  }
}

/** A column reference; comparison methods produce `FilterNode`s. */
export class ColumnRef {
  /** @param {string} name */
  constructor(name) {
    this.name = name;
  }

  eq(value) { return new FilterNode({ column: this.name, eq: value }); }
  neq(value) { return new FilterNode({ column: this.name, neq: value }); }
  gt(value) { return new FilterNode({ column: this.name, gt: value }); }
  gte(value) { return new FilterNode({ column: this.name, gt_eq: value }); }
  lt(value) { return new FilterNode({ column: this.name, lt: value }); }
  lte(value) { return new FilterNode({ column: this.name, lt_eq: value }); }
  /** Inclusive range: `min <= column <= max`. */
  between(min, max) {
    return new FilterNode({ column: this.name, gt_eq: min, lt_eq: max });
  }
  isNull() { return new FilterNode({ is_null: { column: this.name } }); }
  isNotNull() { return new FilterNode({ is_not_null: { column: this.name } }); }
}

/** Start a filter predicate: `col("depth").gte(0)`. */
export function col(name) {
  return new ColumnRef(name);
}

/** Logical AND of every node. @param {...FilterNode} nodes */
export function and(...nodes) {
  return new FilterNode({ and: nodes.map((n) => n.filter) });
}

/** Logical OR of every node. @param {...FilterNode} nodes */
export function or(...nodes) {
  return new FilterNode({ or: nodes.map((n) => n.filter) });
}

// -- select helpers ---------------------------------------------------------

/** A column projection, optionally aliased: `column("TEMP", "t")`. */
export function column(name, alias) {
  return alias === undefined ? name : { column: name, alias };
}

/** A function projection: `func("avg", ["TEMP"], "mean")`. */
export function func(name, args, alias) {
  return { function: name, args, alias };
}

/** A literal projection: `literal(0, "zero")`. */
export function literal(value, alias) {
  return { value, alias };
}

const fieldsProxy = () =>
  new Proxy({}, { get: (_t, prop) => new ColumnRef(String(prop)) });

function resolvePredicate(pred) {
  const value = typeof pred === "function" ? pred(fieldsProxy()) : pred;
  return value instanceof FilterNode ? value.build() : value;
}

// -- query builder ------------------------------------------------------------

/** Fluent builder for a structured (JSON DSL) query. */
export class QueryBuilder {
  /**
   * @param {object} [client] the owning BeaconClient (for execute())
   * @param {string | object} [from]
   */
  constructor(client, from) {
    this._client = client;
    this._select = [];
    this._filters = [];
    this._from = from;
    this._sort = [];
    this._distinct = undefined;
    this._offset = undefined;
    this._limit = undefined;
    this._output = undefined;
  }

  // -- source --
  from(source) { this._from = source; return this; }
  fromTable(name) { this._from = name; return this; }
  fromParquet(paths) { this._from = { parquet: { paths: toArray(paths) } }; return this; }
  fromCsv(paths, delimiter) {
    this._from = { csv: { paths: toArray(paths), delimiter } };
    return this;
  }
  fromArrow(paths) { this._from = { arrow: { paths: toArray(paths) } }; return this; }
  fromNetcdf(paths) { this._from = { netcdf: { paths: toArray(paths) } }; return this; }
  fromOdv(paths) { this._from = { odv: { paths: toArray(paths) } }; return this; }
  fromZarr(paths) { this._from = { zarr: { paths: toArray(paths) } }; return this; }
  fromTiff(paths) { this._from = { tiff: { paths: toArray(paths) } }; return this; }

  // -- projection --
  /** Add projected items (names, `column()`, `func()`, `literal()`). */
  select(...items) { this._select.push(...items); return this; }

  /** DISTINCT keyed by `on`, projecting `select` (defaults to `on`). */
  distinct(on, select) {
    this._distinct = { on, select: select ?? on };
    return this;
  }

  // -- filtering --
  /** Add a filter; multiple `where` calls AND together. */
  where(predicate) { this._filters.push(resolvePredicate(predicate)); return this; }

  // -- ordering / paging --
  orderBy(column) { this._sort.push({ asc: column }); return this; }
  orderByDescending(column) { this._sort.push({ desc: column }); return this; }
  thenBy(column) { return this.orderBy(column); }
  thenByDescending(column) { return this.orderByDescending(column); }
  skip(n) { this._offset = n; return this; }
  take(n) { this._limit = n; return this; }

  /** A materialized output format for `raw()` downloads. */
  output(format) { this._output = format; return this; }

  // -- build --
  /** The JSON DSL query object. */
  build() {
    const query = { select: this._select };
    const filter = combineFilters(this._filters);
    if (filter) query.filter = filter;
    if (this._from !== undefined) query.from = this._from;
    if (this._sort.length) query.sort_by = this._sort;
    if (this._distinct) query.distinct = this._distinct;
    if (this._offset !== undefined) query.offset = this._offset;
    if (this._limit !== undefined) query.limit = this._limit;
    if (this._output !== undefined) query.output = { format: this._output };
    return query;
  }

  /** `JSON.stringify(builder)` emits the DSL. */
  toJSON() { return this.build(); }

  // -- execution --
  execute(options) { return this._runner().query(this.build(), options); }

  async toArray(signal) {
    const { rows } = await this._runner().query(this.build(), { signal });
    return rows;
  }

  async first(signal) {
    const { rows } = await this._runner().query(
      { ...this.build(), limit: 1 }, { signal });
    return rows[0] ?? null;
  }

  toArrow(signal) { return this._runner().queryArrow(this.build(), signal); }
  stream(signal) { return this._runner().queryStream(this.build(), signal); }
  toCsv(signal) { return this._runner().queryCsv(this.build(), signal); }

  _runner() {
    if (!this._client) {
      throw new Error("QueryBuilder is not bound to a client; use build()");
    }
    return this._client;
  }
}

function combineFilters(filters) {
  if (filters.length === 0) return undefined;
  if (filters.length === 1) return filters[0];
  return { and: filters };
}

function toArray(value) {
  return Array.isArray(value) ? value : [value];
}
