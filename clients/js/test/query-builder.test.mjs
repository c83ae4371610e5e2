import assert from "node:assert/strict";
import { test } from "node:test";

import { QueryBuilder, and, col, column, func, literal, or } from "../src/query-builder.mjs";

test("full builder chain emits the engine's JSON DSL", () => {
  const q = new QueryBuilder()
    .fromParquet("lineitem.parquet")
    .select("l_orderkey", column("l_quantity", "qty"), func("round", ["l_tax"], "tax"))
    .where((x) => x.l_quantity.gte(10).and(x.l_quantity.lte(20)))
    .where(col("l_returnflag").eq("N"))
    .orderBy("l_orderkey")
    .thenByDescending("qty")
    .skip(5)
    .take(10)
    .build();
  assert.deepEqual(q, {
    select: [
      "l_orderkey",
      { column: "l_quantity", alias: "qty" },
      { function: "round", args: ["l_tax"], alias: "tax" },
    ],
    filter: {
      and: [
        { and: [
          { column: "l_quantity", gt_eq: 10 },
          { column: "l_quantity", lt_eq: 20 },
        ] },
        { column: "l_returnflag", eq: "N" },
      ],
    },
    from: { parquet: { paths: ["lineitem.parquet"] } },
    sort_by: [{ asc: "l_orderkey" }, { desc: "qty" }],
    offset: 5,
    limit: 10,
  });
});

test("predicate helpers: between / null checks / or", () => {
  const f = or(
    col("depth").between(0, 100),
    and(col("temp").isNotNull(), col("flag").isNull()),
  ).build();
  assert.deepEqual(f, {
    or: [
      { column: "depth", gt_eq: 0, lt_eq: 100 },
      { and: [
        { is_not_null: { column: "temp" } },
        { is_null: { column: "flag" } },
      ] },
    ],
  });
});

test("literal projection and JSON.stringify emit the DSL", () => {
  const q = new QueryBuilder().select(literal(0, "zero")).fromTable("t");
  assert.equal(
    JSON.stringify(q),
    '{"select":[{"value":0,"alias":"zero"}],"from":"t"}',
  );
});

test("unbound builder refuses to execute", async () => {
  await assert.rejects(
    async () => new QueryBuilder().select("a").toArray(),
    /not bound to a client/,
  );
});
