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
}
