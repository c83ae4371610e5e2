/**
 * RFC 4180 CSV parsing for the CSV query path. All values come back as
 * strings — the server's CSV output carries no type information
 * (same contract as the reference SDK's csv fallback,
 * beacon-clients/beacon-ts/src/csv.ts).
 */

/**
 * Parse CSV text into row objects keyed by the header row.
 * @param {string} text
 * @returns {Record<string, string>[]}
 */
export function parseCsv(text) {
  const rows = parseCsvRows(text);
  const header = rows[0];
  if (!header) return [];
  return rows.slice(1).map((cells) => {
    /** @type {Record<string, string>} */
    const obj = {};
    for (let i = 0; i < header.length; i++) obj[header[i]] = cells[i] ?? "";
    return obj;
  });
}

/**
 * Parse CSV text into a 2-D array of cell strings. Handles quoted
 * fields, doubled-quote escapes, and separators/newlines inside quotes.
 * @param {string} text
 * @returns {string[][]}
 */
export function parseCsvRows(text) {
  /** @type {string[][]} */
  const rows = [];
  /** @type {string[]} */
  let row = [];
  let field = "";
  let inQuotes = false;
  let sawContent = false;

  for (let i = 0; i < text.length; i++) {
    const c = text[i];
    if (inQuotes) {
      if (c === '"') {
        if (text[i + 1] === '"') {
          field += '"';
          i++;
        } else {
          inQuotes = false;
        }
      } else {
        field += c;
      }
      continue;
    }
    if (c === '"') {
      inQuotes = true;
      sawContent = true;
    } else if (c === ",") {
      row.push(field);
      field = "";
      sawContent = true;
    } else if (c === "\r") {
      // part of CRLF; the \n ends the row
    } else if (c === "\n") {
      row.push(field);
      rows.push(row);
      row = [];
      field = "";
      sawContent = false;
    } else {
      field += c;
      sawContent = true;
    }
  }
  if (sawContent || field !== "" || row.length > 0) {
    row.push(field);
    rows.push(row);
  }
  return rows;
}
