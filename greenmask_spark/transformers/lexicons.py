"""Embedded lexicons for person/company/address/faker transformers.

The reference embeds data files for persons (internal/generators/
transformers/random_person.go + data), companies (random_company.go) and
real addresses (real_address.go). We ship compact deterministic lexicons;
at cluster scale these are broadcast as literal arrays inside the plan
(a few KB), so lookup is `element_at(array, hash_idx)` — pure codegen,
no join, no shuffle.
"""

FIRST_NAMES_MALE = [
    "James", "John", "Robert", "Michael", "William", "David", "Richard",
    "Joseph", "Thomas", "Charles", "Christopher", "Daniel", "Matthew",
    "Anthony", "Mark", "Donald", "Steven", "Paul", "Andrew", "Joshua",
    "Kenneth", "Kevin", "Brian", "George", "Timothy", "Ronald", "Edward",
    "Jason", "Jeffrey", "Ryan", "Jacob", "Gary", "Nicholas", "Eric",
    "Jonathan", "Stephen", "Larry", "Justin", "Scott", "Brandon",
]

FIRST_NAMES_FEMALE = [
    "Mary", "Patricia", "Jennifer", "Linda", "Elizabeth", "Barbara",
    "Susan", "Jessica", "Sarah", "Karen", "Lisa", "Nancy", "Betty",
    "Margaret", "Sandra", "Ashley", "Kimberly", "Emily", "Donna",
    "Michelle", "Carol", "Amanda", "Dorothy", "Melissa", "Deborah",
    "Stephanie", "Rebecca", "Sharon", "Laura", "Cynthia", "Kathleen",
    "Amy", "Angela", "Shirley", "Anna", "Brenda", "Pamela", "Emma",
    "Nicole", "Helen",
]

LAST_NAMES = [
    "Smith", "Johnson", "Williams", "Brown", "Jones", "Garcia", "Miller",
    "Davis", "Rodriguez", "Martinez", "Hernandez", "Lopez", "Gonzalez",
    "Wilson", "Anderson", "Thomas", "Taylor", "Moore", "Jackson", "Martin",
    "Lee", "Perez", "Thompson", "White", "Harris", "Sanchez", "Clark",
    "Ramirez", "Lewis", "Robinson", "Walker", "Young", "Allen", "King",
    "Wright", "Scott", "Torres", "Nguyen", "Hill", "Flores",
]

TITLES_MALE = ["Mr.", "Dr.", "Prof."]
TITLES_FEMALE = ["Ms.", "Mrs.", "Dr.", "Prof."]

COMPANY_NAMES = [
    "Acme", "Globex", "Initech", "Umbrella", "Stark", "Wayne", "Wonka",
    "Tyrell", "Cyberdyne", "Soylent", "Massive Dynamic", "Hooli", "Pied Piper",
    "Vandelay", "Dunder Mifflin", "Prestige Worldwide", "Oscorp", "Gringotts",
    "Monarch", "Aperture", "Black Mesa", "Virtucon", "Octan", "Zorg",
    "Nakatomi", "Weyland", "Yutani", "Gekko", "Duff", "Sirius",
]

COMPANY_SUFFIXES = [
    "Inc", "LLC", "Ltd", "Group", "Corp", "PLC", "GmbH", "and Sons",
    "Holdings", "Partners",
]

STREET_NAMES = [
    "Maple Street", "Oak Avenue", "Pine Road", "Cedar Lane", "Elm Drive",
    "Washington Boulevard", "Lake View Terrace", "Hillcrest Avenue",
    "Sunset Drive", "River Road", "Park Place", "Madison Avenue",
    "Highland Drive", "Forest Lane", "Meadow Court", "Chestnut Street",
    "Willow Way", "Birch Boulevard", "Spring Street", "Main Street",
]

CITIES = [
    "Springfield", "Riverside", "Franklin", "Greenville", "Bristol",
    "Clinton", "Fairview", "Salem", "Madison", "Georgetown", "Arlington",
    "Ashland", "Dover", "Hudson", "Kingston", "Milton", "Newport",
    "Oxford", "Burlington", "Manchester",
]

STATES = [
    ("Alabama", "AL"), ("Alaska", "AK"), ("Arizona", "AZ"), ("California", "CA"),
    ("Colorado", "CO"), ("Florida", "FL"), ("Georgia", "GA"), ("Illinois", "IL"),
    ("Indiana", "IN"), ("Iowa", "IA"), ("Kansas", "KS"), ("Kentucky", "KY"),
    ("Maine", "ME"), ("Michigan", "MI"), ("Nevada", "NV"), ("New York", "NY"),
    ("Ohio", "OH"), ("Oregon", "OR"), ("Texas", "TX"), ("Washington", "WA"),
]

MONTH_NAMES = [
    "January", "February", "March", "April", "May", "June", "July",
    "August", "September", "October", "November", "December",
]

DAY_NAMES = [
    "Monday", "Tuesday", "Wednesday", "Thursday", "Friday", "Saturday",
    "Sunday",
]

TIMEZONES = [
    "UTC", "America/New_York", "America/Chicago", "America/Denver",
    "America/Los_Angeles", "Europe/London", "Europe/Paris", "Europe/Berlin",
    "Asia/Tokyo", "Asia/Shanghai", "Asia/Kolkata", "Australia/Sydney",
]

DOMAIN_WORDS = [
    "alpha", "beta", "gamma", "delta", "omega", "nova", "terra", "aqua",
    "solar", "lunar", "pixel", "vector", "matrix", "cipher", "quantum",
    "vertex", "zenith", "apex", "echo", "pulse",
]

TLDS = ["com", "org", "net", "io", "dev", "co", "info", "biz"]

WORDS = [
    "time", "year", "people", "way", "day", "man", "thing", "woman", "life",
    "child", "world", "school", "state", "family", "student", "group",
    "country", "problem", "hand", "part", "place", "case", "week", "company",
    "system", "program", "question", "work", "government", "number", "night",
    "point", "home", "water", "room", "mother", "area", "money", "story",
    "fact", "month", "lot", "right", "study", "book", "eye", "job", "word",
    "business", "issue",
]

CC_TYPES = ["Visa", "MasterCard", "American Express", "Discover", "JCB",
            "Diners Club", "UnionPay", "Maestro"]

CURRENCIES = ["USD", "EUR", "GBP", "JPY", "CHF", "CAD", "AUD", "CNY", "SEK",
              "NZD", "MXN", "SGD", "HKD", "NOK", "KRW", "INR", "BRL", "ZAR"]

PASSWORD_SYMBOLS = (
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789!@#$%^&*"
)
