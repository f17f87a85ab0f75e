"""Porter2 stemmer tests.

The ground truth here is the reference's stemmed stopword list
(internal/classify/classify.go:20-71): each stopword entry is the Porter2
stem of the listed source word, so stemming the source must yield the entry.
"""

import pytest

from sift_ray.textproc.stemmer import stem

# (source word, expected Porter2 stem) — derived from classify.go:20-71 comments
STOPWORD_DERIVATIONS = [
    ("author", "author"), ("authors", "author"),
    ("appendix", "appendix"),
    ("book", "book"), ("books", "book"),
    ("chapter", "chapter"), ("chapters", "chapter"),
    ("contents", "content"), ("content", "content"),
    ("edition", "edit"), ("editions", "edit"), ("edit", "edit"),
    ("ebook", "ebook"),
    ("footer", "footer"),
    ("glossary", "glossari"), ("glossaries", "glossari"),
    ("gutenberg", "gutenberg"),
    ("navigation", "navig"), ("navigate", "navig"),
    ("note", "note"), ("notes", "note"),
    ("page", "page"), ("pages", "page"),
    ("project", "project"),
    ("published", "publish"), ("publishing", "publish"), ("publisher", "publish"),
    ("text", "text"),
    ("about", "about"),
    ("location", "locat"), ("located", "locat"),
    ("profile", "profil"), ("profiles", "profil"),
    ("share", "share"), ("sharing", "share"), ("shared", "share"),
    ("update", "updat"), ("updated", "updat"), ("updates", "updat"),
    ("copyright", "copyright"),
    ("manage", "manag"), ("management", "manag"), ("managed", "manag"),
    ("permission", "permiss"), ("permissions", "permiss"),
    ("policy", "polici"), ("policies", "polici"),
    ("privacy", "privaci"),
    ("public", "public"), ("publications", "public"), ("publication", "public"),
    ("purpose", "purpos"), ("purposes", "purpos"),
    ("reproduce", "reproduc"), ("reproduced", "reproduc"),
    ("reserved", "reserv"), ("reserve", "reserv"),
    ("rights", "right"), ("right", "right"),
    ("risk", "risk"), ("risks", "risk"),
    ("standard", "standard"), ("standards", "standard"),
    ("term", "term"), ("terms", "term"),
    ("use", "use"), ("uses", "use"), ("used", "use"), ("using", "use"),
    ("citation", "citat"), ("citations", "citat"),
    ("department", "depart"),
    ("edu", "edu"),
    ("federal", "feder"),
    ("foundation", "foundat"), ("foundations", "foundat"),
    ("https", "https"),
    ("isbn", "isbn"),
    ("references", "refer"), ("reference", "refer"), ("referred", "refer"),
]


@pytest.mark.parametrize("word,expected", STOPWORD_DERIVATIONS)
def test_stopword_derivations(word, expected):
    assert stem(word) == expected


# canonical Porter2 sample pairs from the published spec / demo vocabulary
SPEC_PAIRS = [
    ("consign", "consign"), ("consigned", "consign"), ("consigning", "consign"),
    ("consignment", "consign"),
    ("consist", "consist"), ("consisted", "consist"), ("consistency", "consist"),
    ("consistent", "consist"), ("consistently", "consist"),
    ("consisting", "consist"), ("consists", "consist"),
    ("consolation", "consol"), ("consolations", "consol"),
    ("consolatory", "consolatori"),
    ("console", "consol"), ("consoled", "consol"), ("consoles", "consol"),
    ("consolidate", "consolid"), ("consolidated", "consolid"),
    ("consolidating", "consolid"),
    ("consoling", "consol"),
    ("consols", "consol"),
    ("consonant", "conson"),
    ("consort", "consort"), ("consorted", "consort"), ("consorting", "consort"),
    ("conspicuous", "conspicu"), ("conspicuously", "conspicu"),
    ("conspiracy", "conspiraci"),
    ("conspirator", "conspir"), ("conspirators", "conspir"),
    ("conspire", "conspir"), ("conspired", "conspir"), ("conspiring", "conspir"),
    ("constable", "constabl"), ("constables", "constabl"),
    ("constance", "constanc"),
    ("constancy", "constanc"),
    ("constant", "constant"),
    ("knack", "knack"), ("knackeries", "knackeri"), ("knacks", "knack"),
    ("knag", "knag"),
    ("generate", "generat"), ("generates", "generat"), ("generated", "generat"),
    ("generating", "generat"),
    ("general", "general"), ("generally", "general"),
    ("generic", "generic"), ("generically", "generic"),
    ("generous", "generous"), ("generously", "generous"),
    ("skis", "ski"), ("skies", "sky"), ("dying", "die"), ("lying", "lie"),
    ("tying", "tie"), ("idly", "idl"), ("gently", "gentl"), ("ugly", "ugli"),
    ("early", "earli"), ("only", "onli"), ("singly", "singl"),
    ("sky", "sky"), ("news", "news"), ("howe", "howe"), ("atlas", "atlas"),
    ("cosmos", "cosmos"), ("bias", "bias"), ("andes", "andes"),
    ("inning", "inning"), ("outing", "outing"), ("canning", "canning"),
    ("herring", "herring"), ("earring", "earring"), ("proceed", "proceed"),
    ("exceed", "exceed"), ("succeed", "succeed"),
    ("cries", "cri"), ("ties", "tie"), ("tied", "tie"), ("cry", "cri"),
    ("by", "by"), ("say", "say"),
    ("gas", "gas"), ("gaps", "gap"), ("kiwis", "kiwi"),
    ("hoping", "hope"), ("hopping", "hop"), ("hopeful", "hope"),
    ("bedding", "bed"),
    ("luxuriated", "luxuri"),
    ("communication", "communic"),
    ("arsenal", "arsenal"),
]


@pytest.mark.parametrize("word,expected", SPEC_PAIRS)
def test_spec_pairs(word, expected):
    assert stem(word) == expected


def test_short_words_unchanged():
    for w in ("a", "an", "is", "I", "it"):
        assert stem(w) == w.lower()


def test_case_insensitive():
    assert stem("Copyright") == "copyright"
    assert stem("NAVIGATION") == "navig"
