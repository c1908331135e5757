// Golden-vector generator for stemmer parity (SURVEY T11).
//
// Runs one of the reference's bundled stemmers (PUBLIC reference content,
// /root/reference/src/lib/stemmers/<code>.js) over a JSON array of words
// and prints {word: stem} JSON. Words that make the stemmer throw map to
// "<ERR:...>"; the engine treats those as returned-unstemmed, because the
// reference's caller does the same (SnowballStemmer.ts:44-49).
//
// Usage:  node tools/gen_stem_vectors.mjs <code> <vocab.json> > gold.json
// The pinned vectors in tests/golden/snowball.json (800/language, 28
// languages) were produced this way from wide morphological vocabularies.
import { readFileSync } from 'fs';
const [code, vocabPath] = process.argv.slice(2);
const mod = await import(`/root/reference/src/lib/stemmers/${code}.js`);
const words = JSON.parse(readFileSync(vocabPath, 'utf8'));
const out = {};
for (const w of words) {
  try { out[w] = mod.stemmer(w); } catch (e) { out[w] = `<ERR:${e.message}>`; }
}
process.stdout.write(JSON.stringify(out));
