package graft.gedcom

/** Frozen expected summary for q63_gedcom_pipeline as DuckDB literals.
  *
  * Every row below is hand-derived from the reference semantics
  * (lib/csv_writer.js) applied to src/test/resources/m1.ged, and each fact
  * is independently asserted record-by-record in GedcomSpec:
  *   - HEAD maps to a Header node with Source; I1/I2 are Individual nodes;
  *     F1's children are all pointers but its @F1@ id alone makes the node
  *     row non-empty (the reference inserts `Gedcom Id:ID` BEFORE the
  *     emptiness check, lib/csv_writer.js:125-127,181-184 — so FAM gets a
  *     node row with just id+label); TRLR is mapped but id-less and empty
  *     (no node row); ZZZZ is unmapped (skipped).
  *   - property keys: NAME splits into Name/Given Name/Surname; BIRT
  *     children become "Birth Date"/"Birth Place"; EVEN promotes its Type
  *     ("Graduation Date"); booleans from _PRIMARY/_ITALIC; repeated RESI
  *     last-wins into one "Residence Date"; SLGC TEMP lookup last-wins into
  *     "Sealing to Parents Temple"; every node row carries ":LABEL".
  *   - edges from the root id: FAMS -> Spouse in Family, HUSB/WIFE/CHIL.
  *   - BOGUS is the one unused tag, NOWHERE the one unknown temple code.
  */
object GedcomOracle {
  val SQL: String = """
    SELECT section, name, CAST(n AS BIGINT) AS n
    FROM (VALUES
      ('edge', 'Child', 1),
      ('edge', 'Husband', 1),
      ('edge', 'Spouse in Family', 1),
      ('edge', 'Wife', 1),
      ('missing_temple', 'NOWHERE', 1),
      ('node', 'FAM', 1),
      ('node', 'HEAD', 1),
      ('node', 'INDI', 2),
      ('node_key', ':LABEL', 4),
      ('node_key', 'Birth Date', 1),
      ('node_key', 'Birth Place', 1),
      ('node_key', 'Gedcom Id:ID', 3),
      ('node_key', 'Given Name', 2),
      ('node_key', 'Graduation Date', 1),
      ('node_key', 'Name', 2),
      ('node_key', 'Note', 1),
      ('node_key', 'Primary', 1),
      ('node_key', 'Print in Italics', 1),
      ('node_key', 'Residence Date', 1),
      ('node_key', 'Sealing to Parents Temple', 1),
      ('node_key', 'Sex', 1),
      ('node_key', 'Source', 1),
      ('node_key', 'Surname', 1),
      ('node_key', 'Universally Unique ID', 1),
      ('skipped', 'ZZZZ', 1),
      ('unused_tag', 'BOGUS', 1)
    ) AS t(section, name, n)
    ORDER BY section, name"""

  /** Frozen expected summary for q72_gedcom_semantics over m2.ged.
    *
    * Hand-derivation (lib/csv_writer.js semantics, record by record):
    *   - HEAD: {Source, :LABEL} node row.
    *   - I10: NAME "Anna Maria /Keller/ the Younger" splits to Given Name
    *     "Anna Maria " (pre-slash text INCLUDING its trailing space — JS
    *     parity), Surname "Keller", suffix dropped, full value kept under
    *     Name; BIRT/DEAT nest into "Birth Date"/"Birth Place"/"Death Date";
    *     RESI > ADDR > CITY/CTRY flattens by concatenating parents:
    *     "Residence Address", "Residence Address City", "Residence Address
    *     Country"; NOTE merges CONC verbatim and CONT with a newline:
    *     "abc"+"def"+"ghi"+"\n"+"tail"; EVEN has no Type so the composite
    *     prefix is literally "undefined" ("undefined Date"); repeated OCCU
    *     is last-wins ("miller" survives, ONE Occupation key); SLGC > TEMP
    *     LOGAN maps to "Logan Utah", and SLGC > FAMC @F9@ is a pointer at
    *     DEPTH 2 — the edge still originates at the root (I10 -> F9,
    *     relType "Child in Family").
    *   - I11: NAME "/Stone/" has empty pre-slash text -> Surname only, no
    *     Given Name; BURI > PLAC SLAKE takes the temple rewrite ("Salt Lake
    *     City Utah Temple"); SLGC > TEMP ZION is an unknown code -> value
    *     kept verbatim + missing_temple row; ASSO @I10@ -> Associates edge.
    *   - F9: HUSB/CHIL pointer edges (dangling @I12@ still emits an edge);
    *     MARR nests "Marriage Date"/"Marriage Place" (PLAC NOWHERE is not a
    *     temple code: kept verbatim, NO missing_temple — only TEMP records
    *     misses); QQQQ is unmapped -> unused_tag.
    *   - X1 WEIRD: unmapped top-level tag -> skipped, contributes nothing.
    *   - TRLR: mapped but id-less and childless -> empty map, no node row.
    *   - dates (GedcomDates over every *Date prop): dual-year "2 FEB
    *     1900/01" parses EXACT 1900-02-02 (the /01 alternate year is
    *     descriptive); "INT 1980 (from obituary)" drops the phrase ->
    *     INT 1980-01-01; "BET 1880 AND 1890" captures the range end as
    *     year2=1890; "5 MAY 1920" -> EXACT 1920-05-05.
    *
    * Each fact is independently asserted in GedcomSpec ("m2 fixture"
    * tests) and GedcomDatesSpec. */
  val SQL2: String = """
    SELECT section, name, CAST(n AS BIGINT) AS n
    FROM (VALUES
      ('date', 'Birth Date=EXACT:1900-02-02:null', 1),
      ('date', 'Death Date=INT:1980-01-01:null', 1),
      ('date', 'Marriage Date=BET:1880-01-01:1890', 1),
      ('date', 'undefined Date=EXACT:1920-05-05:null', 1),
      ('edge', 'Associates', 1),
      ('edge', 'Child', 1),
      ('edge', 'Child in Family', 1),
      ('edge', 'Husband', 1),
      ('missing_temple', 'ZION', 1),
      ('node', 'FAM', 1),
      ('node', 'HEAD', 1),
      ('node', 'INDI', 2),
      ('node_key', ':LABEL', 4),
      ('node_key', 'Birth Date', 1),
      ('node_key', 'Birth Place', 1),
      ('node_key', 'Burial Place', 1),
      ('node_key', 'Death Date', 1),
      ('node_key', 'Gedcom Id:ID', 3),
      ('node_key', 'Given Name', 1),
      ('node_key', 'Marriage Date', 1),
      ('node_key', 'Marriage Place', 1),
      ('node_key', 'Name', 2),
      ('node_key', 'Note', 1),
      ('node_key', 'Occupation', 1),
      ('node_key', 'Residence Address', 1),
      ('node_key', 'Residence Address City', 1),
      ('node_key', 'Residence Address Country', 1),
      ('node_key', 'Sealing to Parents Temple', 2),
      ('node_key', 'Sex', 1),
      ('node_key', 'Source', 1),
      ('node_key', 'Surname', 2),
      ('node_key', 'undefined Date', 1),
      ('prop', 'Burial Place=Salt Lake City Utah Temple', 1),
      ('prop', 'Given Name=Anna Maria ', 1),
      ('prop', 'Name=/Stone/', 1),
      ('prop', 'Name=Anna Maria /Keller/ the Younger', 1),
      ('prop', 'Note=abcdefghi' || chr(10) || 'tail', 1),
      ('prop', 'Occupation=miller', 1),
      ('prop', 'Sealing to Parents Temple=Logan Utah', 1),
      ('prop', 'Sealing to Parents Temple=ZION', 1),
      ('skipped', 'WEIRD', 1),
      ('unused_tag', 'QQQQ', 1)
    ) AS t(section, name, n)
    ORDER BY section, name"""
}
