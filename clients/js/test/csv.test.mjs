import assert from "node:assert/strict";
import { test } from "node:test";

import { parseCsv, parseCsvRows } from "../src/csv.mjs";

test("header keys the rows", () => {
  assert.deepEqual(parseCsv("a,b\n1,2\n3,4\n"), [
    { a: "1", b: "2" },
    { a: "3", b: "4" },
  ]);
});

test("quoted fields: separators, newlines, doubled quotes", () => {
  const rows = parseCsvRows('a,"b,c"\n"line\nbreak","she said ""hi"""\n');
  assert.deepEqual(rows, [
    ["a", "b,c"],
    ["line\nbreak", 'she said "hi"'],
  ]);
});

test("CRLF endings and missing trailing newline", () => {
  assert.deepEqual(parseCsvRows("a,b\r\n1,2"), [["a", "b"], ["1", "2"]]);
});

test("empty input", () => {
  assert.deepEqual(parseCsv(""), []);
});
