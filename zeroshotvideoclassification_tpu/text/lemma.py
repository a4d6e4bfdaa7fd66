"""Verb lemmatization for class-name tokens.

The reference lemmatizes any token that has a WordNet verb synset back to its
base verb form (`verbs2basicform`, /root/reference/auxiliary/auxiliary_word2vec.py:212-219)
so e.g. 'running'->'run', 'cutting'->'cut' before Word2Vec lookup.

This module prefers the NLTK WordNet corpus when it is installed (exact
reference parity). When the corpus is unavailable (air-gapped TPU hosts), it
falls back to a self-contained implementation of WordNet's "morphy" rules of
detachment for verbs, backed by an embedded lexicon of action-vocabulary base
verbs and an irregular-form exception table. The fallback is deterministic and
covers the UCF101/HMDB51/Kinetics/ActivityNet class vocabularies.
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, Optional, Sequence

# --------------------------------------------------------------------------
# Optional NLTK backend
# --------------------------------------------------------------------------


@lru_cache(maxsize=1)
def _nltk_backend():
    """Return (synsets_fn, lemmatize_fn) if the WordNet corpus is usable."""
    try:
        from nltk.corpus import wordnet as wn
        from nltk.stem.wordnet import WordNetLemmatizer

        wn.synsets("run")  # force-load; raises LookupError w/o corpus files
        lem = WordNetLemmatizer()
        return (lambda w: wn.synsets(w), lambda w: lem.lemmatize(w, "v"))
    except Exception:
        return None


# --------------------------------------------------------------------------
# Embedded fallback: WordNet verb morphy
# --------------------------------------------------------------------------

# Irregular verb forms (subset of WordNet verb.exc relevant to action-class
# vocabulary; maps inflected form -> base form).
_VERB_EXC = {
    "ran": "run", "running": "run", "runs": "run",
    "swam": "swim", "swum": "swim", "swimming": "swim",
    "dove": "dive", "diving": "dive",
    "rode": "ride", "ridden": "ride", "riding": "ride",
    "threw": "throw", "thrown": "throw", "throwing": "throw",
    "drew": "draw", "drawn": "draw", "drawing": "draw",
    "blew": "blow", "blown": "blow", "blowing": "blow",
    "ate": "eat", "eaten": "eat", "eating": "eat",
    "drank": "drink", "drunk": "drink", "drinking": "drink",
    "sang": "sing", "sung": "sing", "singing": "sing",
    "dug": "dig", "digging": "dig",
    "cut": "cut", "cutting": "cut",
    "hit": "hit", "hitting": "hit",
    "sat": "sit", "sitting": "sit",
    "set": "set", "setting": "set",
    "got": "get", "gotten": "get", "getting": "get",
    "put": "put", "putting": "put",
    "shot": "shoot", "shooting": "shoot",
    "slid": "slide", "sliding": "slide",
    "spun": "spin", "spinning": "spin",
    "stood": "stand", "standing": "stand",
    "swung": "swing", "swinging": "swing",
    "wove": "weave", "woven": "weave", "weaving": "weave",
    "wrote": "write", "written": "write", "writing": "write",
    "made": "make", "making": "make",
    "rose": "rise", "risen": "rise", "rising": "rise",
    "fell": "fall", "fallen": "fall", "falling": "fall",
    "flew": "fly", "flown": "fly", "flying": "fly",
    "held": "hold", "holding": "hold",
    "knelt": "kneel", "kneeling": "kneel",
    "crept": "creep", "creeping": "creep",
    "leapt": "leap", "leaping": "leap",
    "slept": "sleep", "sleeping": "sleep",
    "swept": "sweep", "sweeping": "sweep",
    "wept": "weep", "weeping": "weep",
    "hung": "hang", "hanging": "hang",
    "dyeing": "dye", "dying": "die",
    "tying": "tie", "ty": "tie",
    "lying": "lie",
    "hopping": "hop", "hopped": "hop",
    "skipping": "skip", "skipped": "skip",
    "shopping": "shop", "shopped": "shop",
    "mopping": "mop", "mopped": "mop",
    "chopping": "chop", "chopped": "chop",
    "dropping": "drop", "dropped": "drop",
    "flipping": "flip", "flipped": "flip",
    "clapping": "clap", "clapped": "clap",
    "slapping": "slap", "slapped": "slap",
    "snapping": "snap", "snapped": "snap",
    "wrapping": "wrap", "wrapped": "wrap",
    "stepping": "step", "stepped": "step",
    "petting": "pet", "petted": "pet",
    "patting": "pat", "patted": "pat",
    "batting": "bat", "batted": "bat",
    "knitting": "knit", "knitted": "knit",
    "spitting": "spit", "spat": "spit",
    "jogging": "jog", "jogged": "jog",
    "hugging": "hug", "hugged": "hug",
    "tugging": "tug", "tugged": "tug",
    "digging": "dig", "dragging": "drag", "dragged": "drag",
    "begging": "beg", "begged": "beg",
    "grabbing": "grab", "grabbed": "grab",
    "stirring": "stir", "stirred": "stir",
    "strumming": "strum", "strummed": "strum",
    "drumming": "drum", "drummed": "drum",
    "humming": "hum", "hummed": "hum",
    "swimming": "swim",
    "trimming": "trim", "trimmed": "trim",
    "slamming": "slam", "slammed": "slam",
    "planning": "plan", "planned": "plan",
    "scanning": "scan", "scanned": "scan",
    "pinning": "pin", "pinned": "pin",
    "grinning": "grin", "grinned": "grin",
    "winning": "win", "won": "win",
    "spinning": "spin",
    "skidding": "skid",
    "nodding": "nod", "nodded": "nod",
    "bidding": "bid",
    "paddling": "paddle", "juggling": "juggle",
    "squatting": "squat", "squatted": "squat",
    "strutting": "strut",
    "rappelling": "rappel",
    "travelling": "travel", "traveling": "travel",
    "whipping": "whip", "whipped": "whip",
    "ripping": "rip", "ripped": "rip",
    "dipping": "dip", "dipped": "dip",
    "zipping": "zip", "zipped": "zip",
    "sipping": "sip", "sipped": "sip",
    "rubbing": "rub", "rubbed": "rub",
    "scrubbing": "scrub", "scrubbed": "scrub",
    "stabbing": "stab", "stabbed": "stab",
    "bobbing": "bob",
    "jabbing": "jab",
    "mowing": "mow", "mown": "mow",
    "sawing": "saw", "sawn": "saw",
    "sewing": "sew", "sewn": "sew",
    "bent": "bend", "bending": "bend",
    "built": "build", "building": "build",
    "bought": "buy", "buying": "buy",
    "caught": "catch", "catching": "catch",
    "taught": "teach", "teaching": "teach",
    "fought": "fight", "fighting": "fight",
    "brought": "bring", "bringing": "bring",
    "fed": "feed", "feeding": "feed",
    "led": "lead", "leading": "lead",
    "read": "read", "reading": "read",
    "rowed": "row", "rowing": "row",
    "said": "say", "saying": "say",
    "sold": "sell", "selling": "sell",
    "told": "tell", "telling": "tell",
    "went": "go", "gone": "go", "going": "go",
    "did": "do", "done": "do", "doing": "do",
    "seen": "see", "seeing": "see",
    "took": "take", "taken": "take", "taking": "take",
    "gave": "give", "given": "give", "giving": "give",
    "came": "come", "coming": "come",
    "found": "find", "finding": "find",
    "kept": "keep", "keeping": "keep",
    "left": "leave", "leaving": "leave",
    "lost": "lose", "losing": "lose",
    "meant": "mean", "meaning": "mean",
    "met": "meet", "meeting": "meet",
    "paid": "pay", "paying": "pay",
    "sent": "send", "sending": "send",
    "spent": "spend", "spending": "spend",
    "wore": "wear", "worn": "wear", "wearing": "wear",
    "woke": "wake", "woken": "wake", "waking": "wake",
    "broke": "break", "broken": "break", "breaking": "break",
    "chose": "choose", "chosen": "choose", "choosing": "choose",
    "froze": "freeze", "frozen": "freeze", "freezing": "freeze",
    "spoke": "speak", "spoken": "speak", "speaking": "speak",
    "stole": "steal", "stolen": "steal", "stealing": "steal",
    "strode": "stride", "striding": "stride",
    "struck": "strike", "striking": "strike",
    "bet": "bet", "betting": "bet",
    "shaved": "shave", "shaven": "shave", "shaving": "shave",
    "smoking": "smoke", "skating": "skate", "baking": "bake",
    "waving": "wave", "saving": "save", "carving": "carve",
    "serving": "serve", "surfing": "surf",
    "fencing": "fence", "dancing": "dance", "bouncing": "bounce",
    "racing": "race", "icing": "ice", "dicing": "dice", "slicing": "slice",
    "juicing": "juice",
}

# Base-form verbs that exist as WordNet verb lemmas, covering the action
# vocabulary of the supported datasets.
_VERB_LEXICON = frozenset("""
apply arch argue arrange assemble awake bake balance band bat bathe beg belly
bend bike blast blend blow board bob boat bowl box braid break breakdance brew
bribe bring brush build bump bungee burp bury bust buy calculate camp carry
cart carve cast catch celebrate change chase chat check cheer chew chop clap
clean clear climb clip coach color comb come cook count crack craft crawl
cry cuddle curl dance deal decorate dice die dig dine dip dive do dodge drag
draw dress dribble drink drive drop drum dry dunk dust dye eat eggs embroider
exercise extinguish face fall feed fence fetch fight fill film find finger fish
fix flip float fly fold fondle forge freeze fry garden gargle get give glide go
golf grab grill grin grind groom guard gut hammer hand handle hang harvest
hatch head hear helicopter herd hike hit hold hop hose huddle hug hula hum hunt
hurdle hurl ice inflate iron jack jog juggle juice jump keep kick kiss kite
knead kneel knit knock know land laugh launch lay lead leap learn leave lick
lie lift light line listen live long look lose lunge make march marinate
massage meet milk mime mix moon mop mosh move mow nail nod open paddle paint
park parkour pass pat pay peel perform pet photograph pick picnic pinch pirouette
pitch plan plant play plow pole polish post pour practice present press pretend
pull pump punch push put race raft raise rake rappel read record reel repair
rescue ride rinse rip roast rob rock roll rope row rub run sail salsa salute
sand save saw say scan score scramble scrape scrub scuba seal seat see serve
set sew shake shape sharpen shave shear shine shoe shoot shop shovel show
shred shuffle shut sign sing sip sit skate sketch ski skid skip skydive slack
slam slap sled sleep slice slide sling smash smell smile smoke snap snatch
sneeze sniff snore snorkel snow snowboard somersault sort speak spin spit
splash spray spread spring sprint squat squeeze stack stand staple stare start
steal steer step stick stir stomp stretch stride strike string strum strut
stuff surf swallow sweep swim swing tackle tag take talk tap tape taste
tast teach tear tell tend test text think throw thrust tickle tie till tilt
toss train trade trap travel tread trim trip try tumble turn tug twist type
unbox unload unpack use vacuum vault visit wade wait wake walk wash watch
water waterski wave wax weave weld whip whistle win wind windsurf wink wipe
work wrap wrestle write yawn yell zip zumba bow bounce brush catch chase climb
""".split())

_VERB_RULES = (  # WordNet verb rules of detachment (suffix, replacement)
    ("s", ""),
    ("ies", "y"),
    ("es", "e"),
    ("es", ""),
    ("ed", "e"),
    ("ed", ""),
    ("ing", "e"),
    ("ing", ""),
)


def _candidates(word: str) -> List[str]:
    """Apply verb detachment rules (plus consonant un-doubling) once."""
    out = []
    for suf, rep in _VERB_RULES:
        if word.endswith(suf) and len(word) > len(suf):
            stem = word[: -len(suf)] + rep
            out.append(stem)
            # doubled final consonant: 'hopp' -> 'hop'
            if len(stem) >= 3 and stem[-1] == stem[-2] and stem[-1] not in "aeiou":
                out.append(stem[:-1])
    return out


def _fallback_base_verb(word: str) -> Optional[str]:
    """Return the base verb form if `word` looks like an (inflected) verb."""
    if word in _VERB_EXC:
        return _VERB_EXC[word]
    if word in _VERB_LEXICON:
        return word
    for cand in _candidates(word):
        if cand in _VERB_LEXICON:
            return cand
    return None


def verbs2basicform(words: Sequence[str]) -> List[str]:
    """Lemmatize each word to its base verb form iff it has a verb reading.

    Parity target: /root/reference/auxiliary/auxiliary_word2vec.py:212-219.
    """
    backend = _nltk_backend()
    ret = []
    for w in words:
        if backend is not None:
            synsets_fn, lemmatize_fn = backend
            if any(s.pos() == "v" for s in synsets_fn(w)):
                w = lemmatize_fn(w)
        else:
            base = _fallback_base_verb(w)
            if base is not None:
                w = base
        ret.append(w)
    return ret
