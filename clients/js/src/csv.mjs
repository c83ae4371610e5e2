/**
 * RFC 4180 CSV parsing for the CSV query path. All values come back as
 * strings — the server's CSV output carries no type information.
 *
 * Implementation: an index-scanning tokenizer. Each field is consumed
 * in one of two modes — a quoted field scans quote-to-quote (doubled
 * quotes collapse), an unquoted field slices straight to the next
 * delimiter/newline — so unquoted content is substringed, never
 * accumulated character by character.
 */

/**
 * Parse CSV text into row objects keyed by the header row.
 * @param {string} text
 * @returns {Record<string, string>[]}
 */
export function parseCsv(text) {
  const rows = parseCsvRows(text);
  if (rows.length === 0) return [];
  const header = rows[0];
  const out = new Array(rows.length - 1);
  for (let r = 1; r < rows.length; r++) {
    /** @type {Record<string, string>} */
    const obj = {};
    for (let c = 0; c < header.length; c++) obj[header[c]] = rows[r][c] ?? "";
    out[r - 1] = obj;
  }
  return out;
}

/**
 * Parse CSV text into a 2-D array of cell strings.
 * @param {string} text
 * @returns {string[][]}
 */
export function parseCsvRows(text) {
  /** @type {string[][]} */
  const rows = [];
  /** @type {string[]} */
  let row = [];
  const n = text.length;
  let i = 0;
  while (i < n) {
    let value;
    if (text[i] === '"') {
      // quoted field: hop quote to quote; "" is a literal quote
      const parts = [];
      i++;
      for (;;) {
        const q = text.indexOf('"', i);
        if (q < 0) {
          parts.push(text.slice(i));
          i = n;
          break;
        }
        parts.push(text.slice(i, q));
        if (text[q + 1] === '"') {
          parts.push('"');
          i = q + 2;
        } else {
          i = q + 1;
          break;
        }
      }
      value = parts.join("");
    } else {
      // unquoted field: slice to the next delimiter or line end
      let j = i;
      while (j < n && text[j] !== "," && text[j] !== "\n" && text[j] !== "\r") j++;
      value = text.slice(i, j);
      i = j;
    }
    row.push(value);
    // consume the terminator after the field
    if (i < n && text[i] === ",") {
      i++;
      if (i === n) {
        // a trailing comma means one final empty field
        row.push("");
      }
      continue;
    }
    if (i < n) {
      if (text[i] === "\r") i++;
      if (i < n && text[i] === "\n") i++;
      rows.push(row);
      row = [];
    }
  }
  if (row.length && !(row.length === 1 && row[0] === "")) rows.push(row);
  return rows;
}
